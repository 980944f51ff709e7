package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.jobs.{CorpusPrepStream, SnapshotLake}
import graft.operators.{CurationOps, DedupOps}
import graft.streaming.CorpusStreams.DocIn

class CorpusPrepStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // a long unique-vocabulary document that clears the quality gate
  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
  // near-duplicates of A: one token changed — most shingles shared, so at
  // least one MinHash band agrees (asserted as a precondition below
  // against the frozen kernel, so a kernel change fails loudly here)
  private val textA1 = textA.replace("alpha17", "changed17")
  private val textA2 = textA.replace("alpha23", "changed23")

  // heldout index: doc 83 lands in the heldout split
  // ((83 * 2654435761) % 100 = 63... chosen by the assertion below), and
  // carries a known 13-gram the contaminated arrival repeats verbatim
  private val shared13 = (1 to 13).map(i => s"h$i").mkString(" ")

  private def heldoutIndexDir(): DataFrame = {
    import spark.implicits._
    val corpus = tmp("cps-heldout")
    // find a doc id in the heldout split (>= 80 bucket)
    val hid = (1L to 200L).find(id => (id * 2654435761L) % 100 >= 80).get
    Seq((hid, s"$shared13 tail1 tail2"),
        (1L, (1 to 15).map(i => s"tr$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$corpus/documents.parquet")
    CurationOps.heldoutIndex(spark, corpus)
  }

  test("precondition: the near-dup texts share >= 1 MinHash band with A") {
    import spark.implicits._
    val docs = Seq((1L, textA), (2L, textA1), (3L, textA2))
      .toDF("doc_id", "text")
    val bands = DedupOps.bandRows(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("band"), r.getAs[String]("sig"))).toSet)
      .toMap
    assert((bands(1L) intersect bands(2L)).nonEmpty,
      "textA1 must band-collide with textA — adjust the changed token")
    assert((bands(1L) intersect bands(3L)).nonEmpty,
      "textA2 must band-collide with textA — adjust the changed token")
  }

  test("end-to-end: quality, exact, near-dup, decon drop in order; survivors land; later batches probe the lake") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-lake")
    val ckpt = tmp("cps-ckpt")
    val mem = MemoryStream[DocIn]
    val q = CorpusPrepStream.start(spark, mem.toDF(), heldout, lake, ckpt)
    val base = 1700000000L * 1000000000L
    try {
      mem.addData(
        DocIn(10, base, textA),                          // survives
        DocIn(11, base, "a b c"),                        // quality: too short
        DocIn(12, base, textA),                          // exact dup of 10
        DocIn(13, base, textA1),                         // near-dup of 10
        DocIn(14, base, s"pre1 pre2 $shared13 post1 post2"), // contaminated
        DocIn(15, base, textB))                          // survives
      q.processAllAvailable()

      val docs1 = SnapshotLake.read(spark, s"$lake/documents")
        .select("doc_id").as[Long].collect().sorted
      assert(docs1.toSeq === Seq(10L, 15L), s"batch-1 survivors: ${docs1.mkString(",")}")
      val owners = SnapshotLake.read(spark, s"$lake/bands")
        .select("owner").distinct().as[Long].collect().sorted
      assert(owners.toSeq === Seq(10L, 15L))
      val att1 = SnapshotLake.read(spark, s"$lake/attrition")
        .filter(col("ingest_batch") === 0)
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
      assert(att1 === Map(
        "00_input" -> 6L, "01_quality_gate" -> 5L, "01b_lm_filter" -> -1L,
        "01c_clf_filter" -> -1L, "02_exact_dedup" -> 4L,
        "03_neardup_guard" -> 3L, "04_decontaminate" -> 2L), att1.toString)

      // batch 2: the lake is the dedup state — re-arrivals and near-dups
      // of ACCEPTED docs drop, fresh content lands
      mem.addData(
        DocIn(20, base + 1000L, textB),   // exact re-arrival (new id, landed text)
        DocIn(21, base + 1000L, textA2),  // near-dup of landed doc 10
        DocIn(22, base + 1000L, textC))   // fresh
      q.processAllAvailable()

      val docs2 = SnapshotLake.read(spark, s"$lake/documents")
        .select("doc_id").as[Long].collect().sorted
      assert(docs2.toSeq === Seq(10L, 15L, 22L), s"batch-2 survivors: ${docs2.mkString(",")}")
      val att2 = SnapshotLake.read(spark, s"$lake/attrition")
        .filter(col("ingest_batch") === 1)
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
      assert(att2 === Map(
        "00_input" -> 3L, "01_quality_gate" -> 3L, "01b_lm_filter" -> -1L,
        "01c_clf_filter" -> -1L, "02_exact_dedup" -> 2L,
        "03_neardup_guard" -> 1L, "04_decontaminate" -> 1L), att2.toString)
    } finally q.stop()
  }

  test("LM guard: arriving junk drops against the frozen offline model; scores match the batch kernel") {
    import spark.implicits._
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-lmlake")
    // frozen model: trained OFFLINE on a reference corpus frame (the
    // caller's artifact), exactly how the batch pipeline trains its
    // stage-2b LM — same kernel, so scores cannot drift between twins
    val refText = (1 to 30).map(i => s"ref$i").mkString(" ")
    val refDocs = Seq((900L, "src0", refText), (901L, "src0", refText))
      .toDF("doc_id", "source", "text")
    val model = CurationOps.lmModelOf(refDocs, "src0")
    // threshold between the in-distribution score and the ln(V) ceiling,
    // measured through the BATCH scorer (the single-sourced kernel)
    val sIn = CurationOps.lmScoreOf(
        Seq((1L, refText)).toDF("doc_id", "text"), model, carry = Nil)
      .collect()(0).getAs[Double]("avg_nll")
    val junk = (1 to 30).map(i => s"junk$i").mkString(" ")
    val sJunk = CurationOps.lmScoreOf(
        Seq((1L, junk)).toDF("doc_id", "text"), model, carry = Nil)
      .collect()(0).getAs[Double]("avg_nll")
    assert(sIn < sJunk)
    val cfg = CorpusPrepStream.Config(lmMaxAvgNll = (sIn + sJunk) / 2)

    val b = Seq((10L, 1L, refText), (11L, 1L, junk))
      .toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b, 0L, heldout, lake, cfg,
      lm = Some(model))
    val docs = SnapshotLake.read(spark, s"$lake/documents")
      .select("doc_id").as[Long].collect().sorted
    assert(docs.toSeq === Seq(10L), s"survivors: ${docs.mkString(",")}")
    val att = SnapshotLake.read(spark, s"$lake/attrition")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
    assert(att("01_quality_gate") === 2L && att("01b_lm_filter") === 1L)
  }

  test("clf guard: below-threshold arrivals drop against the frozen committed classifier") {
    import spark.implicits._
    import graft.operators.{Clf, ClfWeights}
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-clflake")
    // measure both candidate texts through the BATCH scorer (the
    // single-sourced kernel) and cut between them — twin-drift-proof
    // and independent of the committed weight values
    val tLo = (1 to 30).map(i => s"low$i").mkString(" ")
    val tHi = (1 to 30).map(i => s"high$i").mkString(" ")
    val s = Clf.scoreOf(
        Seq((1L, tLo), (2L, tHi)).toDF("doc_id", "text"),
        Clf.frozen, ClfWeights.Buckets, carry = Nil)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit")).toMap
    assert(s(1L) !== s(2L), s"degenerate fixture: $s")
    val keepId = if (s(1L) < s(2L)) 11L else 10L
    val cfg = CorpusPrepStream.Config(
      clfMinLogit = Some((s(1L) + s(2L)) / 2))

    val b = Seq((10L, 1L, tLo), (11L, 1L, tHi)).toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b, 0L, heldout, lake, cfg)
    val docs = SnapshotLake.read(spark, s"$lake/documents")
      .select("doc_id").as[Long].collect().sorted
    assert(docs.toSeq === Seq(keepId), s"survivors: ${docs.mkString(",")}")
    val att = SnapshotLake.read(spark, s"$lake/attrition")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
    assert(att("01_quality_gate") === 2L && att("01c_clf_filter") === 1L)
  }

  test("drift gauge: per-batch PSI against the frozen reference lands in <lake>/drift; " +
    "a collapsed-vocabulary batch alarms; redelivery exactly-once; off by default") {
    import spark.implicits._
    val ops = operators.TextAnalysisOps
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-driftlake")
    // diverse reference docs with varied lengths (so the decile edges are
    // non-degenerate); junk = collapsed single-token vocabulary
    def diverse(i: Int): String =
      (1 to (20 + i % 60)).map(j => s"w${(i * 31 + j) % 500}").mkString(" ")
    def junk(): String = Seq.fill(30)("dup").mkString(" ")
    val ref = ops.driftReferenceOf(ops.qualityScoredOf(
      (0 until 200).map(i => (i.toLong, diverse(i))).toDF("doc_id", "text")))
    val cfg = CorpusPrepStream.Config(driftRef = Some(ref))

    val b0 = (0 until 50).map(i => (1000L + i, 1L, diverse(i + 7))).toDF("doc_id", "ts", "text")
    val b1 = (0 until 50).map(i => (2000L + i, 2L, junk())).toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b0, 0L, heldout, lake, cfg)
    CorpusPrepStream.processBatch(spark, b1, 1L, heldout, lake, cfg)
    val drift = SnapshotLake.read(spark, s"$lake/drift").collect()
      .map(r => (r.getAs[Long]("ingest_batch"), r.getAs[Long]("bucket")) ->
        r.getAs[Double]("term")).toMap
    val psiIn = drift((0L, -1L))
    val psiJunk = drift((1L, -1L))
    assert(psiJunk > 0.25, s"collapsed batch PSI $psiJunk under the alarm threshold")
    assert(psiIn < psiJunk, s"in-distribution $psiIn not below drifted $psiJunk")
    // the gauge is a MONITOR: the junk batch still went through the
    // gates (its exact-dup collapse happens there, not here)
    assert(SnapshotLake.read(spark, s"$lake/drift").count() === 22L) // 2 batches x 11 rows

    // redelivery: same batch id recomputes identically, commits once
    CorpusPrepStream.processBatch(spark, b1, 1L, heldout, lake, cfg)
    assert(SnapshotLake.read(spark, s"$lake/drift").count() === 22L,
      "redelivered batch duplicated drift rows")

    // off by default: no driftRef, no drift table
    val lake2 = tmp("cps-nodrift")
    CorpusPrepStream.processBatch(spark, b0, 0L, heldout, lake2, CorpusPrepStream.Config())
    assert(!new java.io.File(s"$lake2/drift").exists, "drift landed without a reference")
  }

  test("redelivery after a crash between commits is exactly-once per table") {
    import spark.implicits._
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-lake2")
    val cfg = CorpusPrepStream.Config()
    val b0 = Seq((10L, 1L, textA), (15L, 1L, textB)).toDF("doc_id", "ts", "text")

    // first delivery crashes AFTER documents committed, BEFORE bands
    intercept[RuntimeException] {
      CorpusPrepStream.processBatch(spark, b0, 0L, heldout, lake, cfg,
        beforeBands = () => throw new RuntimeException("crash between commits"))
    }
    assert(SnapshotLake.versions(spark, s"$lake/documents").size === 1)
    assert(SnapshotLake.latestVersionOf(spark, s"$lake/bands").isEmpty)

    // redelivery: documents skips (same batch id), bands + attrition land,
    // and the survivor set is IDENTICAL — the batch's own landed rows are
    // excluded from every probe, so its docs are not "exact dups" of
    // themselves
    CorpusPrepStream.processBatch(spark, b0, 0L, heldout, lake, cfg)
    assert(SnapshotLake.versions(spark, s"$lake/documents").size === 1)
    val docIds = SnapshotLake.read(spark, s"$lake/documents")
      .select("doc_id").as[Long].collect().sorted
    assert(docIds.toSeq === Seq(10L, 15L))
    val bandOwners = SnapshotLake.read(spark, s"$lake/bands")
      .select("owner").distinct().as[Long].collect().sorted
    assert(bandOwners.toSeq === Seq(10L, 15L),
      "bands must cover the same survivors the documents commit landed")
    val att = SnapshotLake.read(spark, s"$lake/attrition")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
    assert(att("00_input") === 2L && att("04_decontaminate") === 2L)

    // a full re-run of the same batch id is a no-op on every table
    val vBefore = Seq("documents", "bands", "attrition")
      .map(t => SnapshotLake.versions(spark, s"$lake/$t").size)
    CorpusPrepStream.processBatch(spark, b0, 0L, heldout, lake, cfg)
    val vAfter = Seq("documents", "bands", "attrition")
      .map(t => SnapshotLake.versions(spark, s"$lake/$t").size)
    assert(vBefore === vAfter)

    // the NEXT batch still probes the (crash-recovered) lake correctly
    val b1 = Seq((21L, 2L, textA2), (22L, 2L, textC)).toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b1, 1L, heldout, lake, cfg)
    val after = SnapshotLake.read(spark, s"$lake/documents")
      .select("doc_id").as[Long].collect().sorted
    assert(after.toSeq === Seq(10L, 15L, 22L), s"got ${after.mkString(",")}")
  }

  test("probe scale shape: at 100x corpus / 1x batch, compacted indexes prune lake probes to O(batch-keys) files") {
    import spark.implicits._
    val heldout = heldoutIndexDir()
    val lake = tmp("cps-lake3")
    val cfg = CorpusPrepStream.Config()

    // Build a 200-doc accepted corpus DIRECTLY (the lake's age is just its
    // table contents — commitStreamBatch with the job's own schema and
    // stats columns), then re-cluster with compactIndexes so each data
    // file covers a narrow disjoint probe-key slice.
    val corpusTexts =
      (1 to 199).map(i => (500L + i, (1 to 30).map(j => s"c${i}x$j").mkString(" "))) :+
        (400L -> textA) // a landed doc the probe batch will near-dup against
    corpusTexts.grouped(50).zipWithIndex.foreach { case (chunk, ci) =>
      val docs = chunk.toDF("doc_id", "text")
        .withColumn("ts", lit(1L))
        .withColumn("text_hash", md5(col("text").cast("binary")))
        .withColumn("n_tokens", lit(30L))
        .withColumn("dup_rate", lit(0.0))
        .withColumn("ingest_batch", lit(100L + ci))
        .withColumn("hash_key", xxhash64(col("text_hash")))
      SnapshotLake.commitStreamBatch(spark, s"$lake/documents",
        docs.select("doc_id", "ts", "text", "text_hash", "n_tokens",
          "dup_rate", "ingest_batch", "hash_key"),
        100L + ci, statsCol = Some("hash_key"))
      val bands = DedupOps.bandRows(chunk.toDF("doc_id", "text"))
        .select(col("band"), col("sig"), col("doc_id").as("owner"))
        .withColumn("bkey", xxhash64(col("band"), col("sig")))
        .withColumn("ingest_batch", lit(100L + ci))
      SnapshotLake.commitStreamBatch(spark, s"$lake/bands", bands,
        100L + ci, statsCol = Some("bkey"))
    }
    CorpusPrepStream.compactIndexes(spark, lake, targetFileRows = 16)
    val totalDocFiles = SnapshotLake.read(spark, s"$lake/documents").inputFiles.length
    val totalBandFiles = SnapshotLake.read(spark, s"$lake/bands").inputFiles.length
    assert(totalDocFiles >= 10, s"corpus must be many-filed, got $totalDocFiles")
    assert(totalBandFiles >= 40, s"band index must be many-filed, got $totalBandFiles")

    // One 2-doc batch (1% of corpus age): an exact re-arrival of a landed
    // doc + a fresh doc. The probes must touch only the files the batch's
    // own keys can live in — disjoint ranges after compaction, so at most
    // one file per key (+1 for a key sitting on a range boundary).
    var probeFiles = Map.empty[String, Int]
    val b = Seq((900L, 5L, textA), (901L, 5L, textC)).toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b, 0L, heldout, lake, cfg,
      probeObserver = (table, df) => probeFiles += table -> df.inputFiles.length)

    // correctness through the pruned probes: the re-arrival dropped (its
    // hash lives in exactly one pruned-in file), the fresh doc landed
    val landed = SnapshotLake.read(spark, s"$lake/documents")
      .filter(col("ingest_batch") === 0L).select("doc_id").as[Long].collect()
    assert(landed.toSeq === Seq(901L), s"got ${landed.mkString(",")}")

    // plan shape: probe IO is batch-sized, not corpus-sized
    assert(probeFiles("documents") <= 4,
      s"docs probe read ${probeFiles("documents")} of $totalDocFiles files — 2 hash keys must touch <= 4")
    // bands probe runs on the exact-surviving doc only: <= 4 band keys
    assert(probeFiles("bands") <= 8,
      s"bands probe read ${probeFiles("bands")} of $totalBandFiles files — 4 band keys must touch <= 8")

    // and a near-dup of a LANDED doc still drops through the pruned probe
    val b2 = Seq((910L, 6L, textA1)).toDF("doc_id", "ts", "text")
    CorpusPrepStream.processBatch(spark, b2, 1L, heldout, lake, cfg)
    val landed2 = SnapshotLake.read(spark, s"$lake/documents")
      .filter(col("ingest_batch") === 1L).count()
    assert(landed2 === 0L, "near-dup of a landed doc must drop via the pruned band probe")
  }
}
