package graft

import org.apache.spark.sql.functions._

import graft.jobs.{CorpusPrep, TarShards, TrainingShards}
import graft.operators.CurationOps

/** The corpus → training-artifact hand-off (jobs.TrainingShards): epoch
  * plan honored exactly, token budget structural, deterministic bytes,
  * full round-trip of every document instance through the packed shards.
  */
class TrainingShardsSpec extends SparkSpec {

  private val MetaSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "shard INT, bin BIGINT, docs ARRAY<STRUCT<doc_id: BIGINT, rep: BIGINT, " +
      "source: STRING, offset: BIGINT, n_frag: BIGINT>>")

  /** Skewed two-source corpus: `big` dominates (downsamples under the
    * sqrt mix), `small` upsamples with repeats > 1. */
  private def mkDocs() = {
    import spark.implicits._
    (0 until 120).map { i =>
      val src = if (i < 100) "big" else "small"
      val n = 5 + (i % 7)
      (i.toLong, src, (0 until n).map(k => s"w${i}_$k").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("epoch plan honored exactly; budget structural; every instance round-trips; deterministic bytes") {
    val docs = mkDocs()
    val plan = CurationOps.epochMixOf(docs)
    val cfg = TrainingShards.Config(budget = 32, shards = 4, maxShardBytes = 1L << 20)
    val out = java.nio.file.Files.createTempDirectory("tshards").toString
    TrainingShards.writeShards(spark, docs, plan.select("doc_id", "repeats"), out, cfg)

    // the small source genuinely upsamples — otherwise the repeat
    // machinery under test is vacuous
    val repeats = plan.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(repeats.values.exists(_ > 1L), s"no doc repeats >1: $repeats")

    // read back through the public WebDataset reader
    val samples = TarShards.read(spark, s"$out/shards").collect()
    assert(samples.nonEmpty)
    import spark.implicits._
    val metaDf = samples.toSeq.map(s => (s.key, s.json,
      new String(s.payload, java.nio.charset.StandardCharsets.UTF_8))).toDF("key", "json", "text")
      .select(col("key"), col("text"), from_json(col("json"), MetaSchema).as("m"))
      .select(col("key"), col("text"), col("m.shard"), col("m.bin"), col("m.docs"))
    val meta = metaDf.collect()

    // (1) budget is structural: every sequence <= budget tokens, every
    // NON-TAIL sequence exactly budget
    val byShard = meta.groupBy(_.getAs[Int]("shard"))
    byShard.foreach { case (sh, rows) =>
      val maxBin = rows.map(_.getAs[Long]("bin")).max
      rows.foreach { r =>
        val n = r.getAs[String]("text").split(" ", -1).length
        assert(n <= cfg.budget, s"shard $sh bin ${r.getAs[Long]("bin")}: $n > budget")
        if (r.getAs[Long]("bin") != maxBin)
          assert(n === cfg.budget, s"non-tail sequence underfilled: $n")
      }
    }

    // (2) the epoch plan is honored EXACTLY: each doc appears as exactly
    // `repeats` distinct (doc_id, rep) instances, fragment token counts
    // summing to the doc's own token count
    val frags = meta.flatMap { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("docs").map { d =>
        val off = d.getLong(3).toInt
        val nf = d.getLong(4).toInt
        (d.getLong(0), d.getLong(1), r.getAs[Long]("bin"),
          toks.slice(off, off + nf).mkString(" "), nf.toLong)
      }
    }
    val instTokens = frags.groupBy(f => (f._1, f._2))
      .view.mapValues(_.map(_._5).sum).toMap
    val docTokens = docs.collect()
      .map(r => r.getLong(0) -> (r.getString(2).split(" ", -1).length.toLong, r.getString(2))).toMap
    val instPerDoc = instTokens.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    repeats.foreach { case (doc, rep) =>
      assert(instPerDoc.getOrElse(doc, 0L) === rep,
        s"doc $doc shipped ${instPerDoc.getOrElse(doc, 0L)} times, plan says $rep")
    }
    instTokens.foreach { case ((doc, rep), n) =>
      assert(n === docTokens(doc)._1, s"instance ($doc,$rep) lost tokens: $n")
    }

    // (3) FULL round-trip: every instance's text reassembles byte-equal
    // from its fragments in bin order (a straddling doc regains its
    // split)
    frags.groupBy(f => (f._1, f._2)).foreach { case ((doc, _), fs) =>
      val text = fs.sortBy(_._3).map(_._4).filter(_.nonEmpty).mkString(" ")
      assert(text === docTokens(doc)._2, s"doc $doc did not round-trip")
    }

    // (4) manifest agrees with the shards; stats row set is coherent
    val manifest = spark.read.parquet(s"$out/manifest")
    assert(manifest.count() === meta.length.toLong)
    val stats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("00_docs_in") === 120L)
    assert(stats("03_epoch_instances") === repeats.values.sum)
    assert(stats("04_sequences") === meta.length.toLong)
    assert(stats("05_tokens_packed") ===
      repeats.map { case (d, r) => docTokens(d)._1 * r }.sum)
    assert(stats("06_shards") > 1L, "everything landed in one shard")

    // (5) deterministic byte-for-byte re-export: same files, same md5s —
    // and INDEPENDENT of the input's partitioning (the hash-line order
    // and logical-shard-named writer make bytes a pure function of the
    // data, the property a resumable/reproducible training run needs)
    val out2 = java.nio.file.Files.createTempDirectory("tshards2").toString
    TrainingShards.writeShards(spark, docs.repartition(7),
      plan.select("doc_id", "repeats").repartition(3), out2, cfg)
    def fileMd5s(dir: String): Map[String, String] = {
      val d = new java.io.File(s"$dir/shards")
      d.listFiles().filter(_.getName.endsWith(".tar")).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }
    assert(fileMd5s(out) === fileMd5s(out2),
      "re-export not byte-identical under a different input partitioning")
  }

  test("epoch seeds: different deterministic shuffles of the SAME instance multiset") {
    import spark.implicits._
    val docs = mkDocs()
    val plan = CurationOps.epochMixOf(docs).select(col("doc_id"), col("repeats"))
    def export(seed: Long): (Map[(Long, Long), Long], Seq[String]) = {
      val out = java.nio.file.Files.createTempDirectory(s"tse$seed").toString
      TrainingShards.writeShards(spark, docs, plan, out,
        TrainingShards.Config(budget = 32, shards = 4, epochSeed = seed))
      val metas = TarShards.read(spark, s"$out/shards").collect().map(_.json).toSeq
      val insts = metas.toDF("json")
        .select(explode(from_json(col("json"), MetaSchema).getField("docs")).as("d"))
        .groupBy(col("d.doc_id"), col("d.rep")).agg(sum("d.n_frag").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      (insts, metas.sorted)
    }
    val (i0, m0) = export(0L)
    val (i1, m1) = export(1L)
    // identical instance multiset (every (doc, rep) with its full token
    // count) under both seeds...
    assert(i0 === i1, "epoch seeds must permute, not change, the instance set")
    // ...but a genuinely different layout (the reshuffle is real)
    assert(m0 !== m1, "different epoch seeds produced identical layouts")
  }

  test("--epochs=N: one invocation == N single-epoch exports, byte-identically") {
    val docs = mkDocs()
    // a prep-dir layout run() consumes (documents/, no epoch_plan —
    // the plan recomputes through the same kernel both ways)
    val prep = java.nio.file.Files.createTempDirectory("tsprep").toString
    docs.write.parquet(s"$prep/documents")
    val cfg = TrainingShards.Config(budget = 32, shards = 4)

    val multi = java.nio.file.Files.createTempDirectory("tsmulti").toString
    TrainingShards.run(spark, prep, multi, cfg, epochs = 2)

    def md5s(dir: String): Map[String, String] = {
      val d = new java.io.File(s"$dir/shards")
      d.listFiles().filter(_.getName.endsWith(".tar")).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }
    for (e <- 0 to 1) {
      val single = java.nio.file.Files.createTempDirectory(s"tssingle$e").toString
      TrainingShards.run(spark, prep, single, cfg.copy(epochSeed = e.toLong))
      assert(md5s(s"$multi/epoch-$e") === md5s(single),
        s"epoch-$e differs from the single-epoch export at seed $e")
      // shardlist rides along per epoch and matches too
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$multi/epoch-$e/shardlist.txt")) ===
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$single/shardlist.txt")))
    }
    // the two epochs are genuinely different shuffles
    assert(md5s(s"$multi/epoch-0") !== md5s(s"$multi/epoch-1"),
      "epoch directories carry identical bytes — the reshuffle is vacuous")
  }

  test("shardlist.txt enumerates exactly the tar files, sorted, as relative paths") {
    import org.apache.spark.sql.functions.col
    val docs = mkDocs()
    val plan = CurationOps.epochMixOf(docs).select(col("doc_id"), col("repeats"))
    val out = java.nio.file.Files.createTempDirectory("tslist").toString
    TrainingShards.writeShards(spark, docs, plan, out,
      TrainingShards.Config(budget = 32, shards = 4))
    val listed = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/shardlist.txt")).split("\n").filter(_.nonEmpty).toSeq
    val onDisk = new java.io.File(s"$out/shards").listFiles()
      .map(_.getName).filter(_.endsWith(".tar")).sorted.map(n => s"shards/$n").toSeq
    assert(listed === onDisk)
    assert(listed.nonEmpty)
  }

  test("a doc with repeats = 0 ships zero instances") {
    import spark.implicits._
    val docs = Seq((1L, "a", "x y z"), (2L, "a", "p q r")).toDF("doc_id", "source", "text")
    val plan = Seq((1L, 0L), (2L, 2L)).toDF("doc_id", "repeats")
    val out = java.nio.file.Files.createTempDirectory("tshards0").toString
    TrainingShards.writeShards(spark, docs, plan, out,
      TrainingShards.Config(budget = 4, shards = 2))
    val texts = TarShards.read(spark, s"$out/shards").collect()
      .map(s => new String(s.payload, java.nio.charset.StandardCharsets.UTF_8))
      .flatMap(_.split(" ", -1))
    assert(!texts.contains("x"), "a repeats=0 doc leaked into the shards")
    assert(texts.count(_ == "p") === 2, "repeats=2 doc should appear twice")
  }

  test("CorpusPrep --train-epochs=2: the pipeline lands both epoch dirs; stats sum across epochs") {
    val out = java.nio.file.Files.createTempDirectory("prepepochs").toString
    CorpusPrep.run(spark, sf, out, CorpusPrep.Config(
      epochPlan = true, trainShards = true, trainEpochs = 2,
      trainShardsCfg = TrainingShards.Config(budget = 64, shards = 4)))
    val perEpoch = (0 to 1).map { e =>
      val n = TarShards.read(spark, s"$out/train_shards/epoch-$e/shards").count()
      assert(n > 0, s"epoch-$e empty")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/train_shards/epoch-$e/shardlist.txt")))
      n
    }
    val prepStats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prepStats("08_train_sequences") === perEpoch.sum)
  }

  test("CorpusPrep --train-shards: the curated lake lands as a mounted-ready training artifact") {
    val out = java.nio.file.Files.createTempDirectory("prepshards").toString
    CorpusPrep.run(spark, sf, out, CorpusPrep.Config(
      epochPlan = true, trainShards = true,
      trainShardsCfg = TrainingShards.Config(budget = 64, shards = 4)))
    // shards exist and round-trip; counts agree across the three surfaces
    val nSamples = TarShards.read(spark, s"$out/train_shards/shards").count()
    assert(nSamples > 0)
    assert(spark.read.parquet(s"$out/train_shards/manifest").count() === nSamples)
    val prepStats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prepStats("08_train_sequences") === nSamples)
    // the export consumed THIS run's epoch plan (not a recompute): the
    // instance total in the export stats equals the plan's repeat sum
    val planSum = spark.read.parquet(s"$out/epoch_plan")
      .agg(sum("repeats")).collect()(0).getLong(0)
    val expStats = spark.read.parquet(s"$out/train_shards/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expStats("03_epoch_instances") === planSum)
  }
}
