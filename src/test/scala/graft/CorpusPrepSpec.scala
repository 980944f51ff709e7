package graft

import org.apache.spark.sql.functions._

import graft.jobs.CorpusPrep
import graft.operators.DedupOps

/** End-to-end corpus-preparation job: raw documents -> curated chunked
  * lake + attrition report.
  */
class CorpusPrepSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("corpusprep").toString
    CorpusPrep.run(spark, sf, dir)
    dir
  }

  test("attrition is monotone and the report matches the tables") {
    val stats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("00_input") === Tables.documents(spark, sf).count())
    assert(stats("00_input") >= stats("01_quality_gate"))
    assert(stats("01_quality_gate") >= stats("02_exact_dedup"))
    assert(stats("02_exact_dedup") >= stats("03_neardup_groups"))
    assert(stats("03_neardup_groups") >= stats("04_semantic_dedup"))
    // semantic + decontamination stages off by default: pass-throughs, not
    // silent gates
    assert(stats("04_semantic_dedup") === stats("03_neardup_groups"))
    assert(stats("05_decontaminate") === stats("04_semantic_dedup"))
    assert(stats("05_decontaminate") === spark.read.parquet(s"$out/documents").count())
    assert(stats("06_chunks") === spark.read.parquet(s"$out/chunks").count())
    assert(stats("03_neardup_groups") > 0)
  }

  test("epoch-plan stage: plan covers exactly the kept docs, quota-consistent; off by default") {
    import org.apache.spark.sql.functions._
    // default run (the shared fixture) has no plan table and a -1 stats row
    val defStats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(defStats("07_epoch_plan") === -1L)
    assert(!new java.io.File(s"$out/epoch_plan").exists())

    val pOut = java.nio.file.Files.createTempDirectory("prep-plan").toString
    CorpusPrep.run(spark, sf, pOut, CorpusPrep.Config(epochPlan = true))
    val kept = spark.read.parquet(s"$pOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plan = spark.read.parquet(s"$pOut/epoch_plan").collect()
    assert(plan.map(_.getAs[Long]("doc_id")).toSet === kept)
    val stats = spark.read.parquet(s"$pOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("07_epoch_plan") === kept.size.toLong)
    // per-source sqrt-temperature quota invariant over the SURVIVORS
    val bySrc = plan.groupBy(_.getAs[String]("source"))
    val srcTokens = bySrc.view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    val totalSw = srcTokens.values.toSeq.sorted
      .map(t => BigDecimal(math.sqrt(t.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val corpus = srcTokens.values.sum
    bySrc.foreach { case (src, rows) =>
      val ts = srcTokens(src)
      val quota = math.floor(corpus.toDouble * (math.sqrt(ts.toDouble) / totalSw)).toLong
      val shipped = rows.map(r => r.getAs[Long]("repeats") * r.getAs[Long]("n_tokens")).sum
      val maxTok = rows.map(_.getAs[Long]("n_tokens")).max
      assert(shipped >= quota && shipped < quota + maxTok,
        s"$src: shipped $shipped outside [$quota, ${quota + maxTok})")
    }
  }

  test("prototype-prune stage: D4 cut applied to the frontier exactly; off by default") {
    // off by default: -1 stats row, no silent gate
    val defStats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(defStats("04c_prototype_prune") === -1L)

    val pOut = java.nio.file.Files.createTempDirectory("prep-proto").toString
    CorpusPrep.run(spark, sf, pOut, CorpusPrep.Config(protoPrune = true))
    val keptAfter = spark.read.parquet(s"$pOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the frontier entering the stage is the default run's output (all
    // stages before 5a identical); the stage must remove EXACTLY the
    // keep=false ids of prototypePruneOf over that frontier's embeddings
    val frontier = spark.read.parquet(s"$out/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .join(frontier.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi")
    val pruned = operators.SimilarityOps.prototypePruneOf(spark, emb, 0.25)
      .filter(!col("keep")).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(keptAfter === frontier -- pruned)
    assert(pruned.nonEmpty, "the D4 stage should cut something on the gate lake")
    // attrition report: the stage row carries its own output count and
    // sits between the semantic row and the written corpus
    val stats = spark.read.parquet(s"$pOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("04_semantic_dedup") === frontier.size.toLong)
    assert(stats("04c_prototype_prune") === keptAfter.size.toLong)
    assert(stats("04c_prototype_prune") < stats("04_semantic_dedup"))
  }

  test("decontamination drops a train doc sharing a 13-gram with the heldout split") {
    import spark.implicits._
    // doc_id * 2654435761 % 100: 3 -> 83 (heldout), everything else here is
    // train (1->61, 2->22, 4->44, 5->5, 6->66). Doc 2 (train) contains doc
    // 3's (heldout) 13-token window VERBATIM but with different surrounding
    // text: distinct content hash (survives exact dedup), passes the
    // quality gate (18 distinct tokens, dup_rate 0), and is its near-dup
    // component's minimum id, so the lexical stages all keep it — only the
    // decontamination stage can catch it.
    val shared = (1 to 13).map(i => s"s$i").mkString(" ")
    val corpus = java.nio.file.Files.createTempDirectory("deconcorpus").toString
    Seq(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel",
      2L -> s"t1 t2 t3 t4 t5 $shared",
      3L -> s"$shared h1 h2 h3 h4 h5",
      4L -> "red orange yellow green blue indigo violet gray",
      5L -> "north south east west up down left right",
      6L -> "cat dog bird fish horse sheep goat cow")
      .map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")

    val offOut = java.nio.file.Files.createTempDirectory("deconoff").toString
    CorpusPrep.run(spark, corpus, offOut, CorpusPrep.Config())
    val offIds = spark.read.parquet(s"$offOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offIds.contains(2L), "doc 2 must survive every non-decon stage")

    val onOut = java.nio.file.Files.createTempDirectory("deconon").toString
    CorpusPrep.run(spark, corpus, onOut, CorpusPrep.Config(decontaminate = true))
    val onIds = spark.read.parquet(s"$onOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // identical pipeline except the decon stage: the contaminated train
    // doc 2 drops AND the held-out doc 3 itself leaves the train corpus —
    // shipping the benchmark verbatim would be the worst contamination
    assert(onIds === offIds - 2L - 3L)
    val stats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("05_decontaminate") === stats("04_semantic_dedup") - 2)
  }

  test("fuzzy-decon stage drops a PARAPHRASE of a held-out doc that the verbatim rule misses") {
    import spark.implicits._
    // doc 3 is held-out (3 -> 83); train doc 2 paraphrases it with an
    // edit every 13th token (positions 13/26/39/52 of 60): any 13
    // consecutive tokens contain exactly one multiple of 13, so EVERY
    // 13-gram window crosses an edit and the verbatim rule structurally
    // cannot fire — while ~46 of 58 shingles still agree. LSH banding at
    // that Jaccard is probabilistic by nature (q86 measures the recall);
    // this fixture is a deterministic instance verified to collide
    // (n_agree = 8 of 16 under the frozen kernels), and the stage runs
    // at minEst = 0.4 for margin. Doc 3 itself falls to the NEAR-DUP
    // stage (2 is its component's canonical), but fuzzy flag discovery
    // runs on raw ids, so the train echo still flags.
    val base = (1 to 60).map(i => s"p$i")
    val para = Seq(13, 26, 39, 52).foldLeft(base)((b, i) => b.updated(i - 1, s"A$i"))
    val corpus = java.nio.file.Files.createTempDirectory("fuzzycorpus").toString
    Seq(
      (2L, para.mkString(" ")),            // train paraphrase of 3
      (3L, base.mkString(" ")),            // held-out original
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (4L, "red orange yellow green blue indigo violet gray"))
      .map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")

    // the VERBATIM stage alone cannot catch doc 2 (no shared 13-window),
    // but it does remove held-out doc 3 itself
    val exOut = java.nio.file.Files.createTempDirectory("fuzzoff").toString
    CorpusPrep.run(spark, corpus, exOut, CorpusPrep.Config(decontaminate = true))
    val exIds = spark.read.parquet(s"$exOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exIds.contains(2L), "the paraphrase must slip past the verbatim rule")

    // the fuzzy stage catches it — with or without the exact stage on
    val onOut = java.nio.file.Files.createTempDirectory("fuzzon").toString
    CorpusPrep.run(spark, corpus, onOut,
      CorpusPrep.Config(decontaminate = true, fuzzyDecon = true,
        fuzzyDeconMinEst = 0.4))
    val onIds = spark.read.parquet(s"$onOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onIds === exIds - 2L)
    val stats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("05a_fuzzy_decon") === stats("05_decontaminate") - 1)

    // fuzzy WITHOUT exact: the held-out split still leaves the corpus
    val soloOut = java.nio.file.Files.createTempDirectory("fuzzsolo").toString
    CorpusPrep.run(spark, corpus, soloOut,
      CorpusPrep.Config(fuzzyDecon = true, fuzzyDeconMinEst = 0.4))
    val soloIds = spark.read.parquet(s"$soloOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!soloIds.contains(3L), "held-out docs must never ship")
    assert(!soloIds.contains(2L))
    assert(soloIds.contains(1L) && soloIds.contains(4L))
  }

  test("winnow-dedup stage drops a partial-copy doc the whole-doc MinHash stage misses; off by default") {
    import spark.implicits._
    // doc 20 embeds a 30-token block copied verbatim from doc 10 inside
    // 60 fresh tokens: whole-doc shingle Jaccard ~0.18 — far below the
    // MinHash band floor, so the near-dup group stage structurally
    // misses it — while the copied run (>= w+k-1) guarantees shared
    // winnow fingerprints (position-local evidence).
    val a = (1 to 90).map(i => s"a$i")
    val b = (1 to 60).map(i => s"b$i")
    val copied = a.slice(30, 60) // a31..a60
    val doc20 = (b.take(30) ++ copied ++ b.drop(30)).mkString(" ")
    val corpus = java.nio.file.Files.createTempDirectory("winnowcorpus").toString
    Seq(
      (10L, a.mkString(" ")),
      (20L, doc20),
      (1L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"d$i").mkString(" ")))
      .map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")

    // default pipeline (winnow off): the partial copy SURVIVES
    val offOut = java.nio.file.Files.createTempDirectory("winnowoff").toString
    CorpusPrep.run(spark, corpus, offOut)
    val offIds = spark.read.parquet(s"$offOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offIds === Set(1L, 2L, 10L, 20L),
      "the partial copy must slip past whole-doc MinHash dedup")
    val offStats = spark.read.parquet(s"$offOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(offStats("03b_winnow_dedup") === -1L)

    // winnow stage on: doc 20 drops (its lower-id source survives), and
    // the surviving set equals the frontier minus q50c's own drop list
    val onOut = java.nio.file.Files.createTempDirectory("winnowon").toString
    CorpusPrep.run(spark, corpus, onOut,
      CorpusPrep.Config(winnowDedup = true, winnowThreshold = 0.1))
    val onIds = spark.read.parquet(s"$onOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onIds === Set(1L, 2L, 10L))
    val expectedDrops = operators.CurationOps.winnowDedupOf(
      spark.read.parquet(s"$offOut/documents").select("doc_id", "text"),
      k = 5, w = 4, dfCap = 64, minShared = 2, threshold = 0.1)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(onIds === offIds -- expectedDrops)
    val onStats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onStats("03b_winnow_dedup") === onIds.size.toLong)
    assert(onStats("03_neardup_groups") === offIds.size.toLong)
  }

  test("LM-filter stage drops the off-distribution doc, keeps in-distribution; off by default") {
    import spark.implicits._
    // reference source 'src0' teaches the LM; doc 20 repeats the
    // reference's bigrams (low NLL), doc 21 shares no token with it
    // (every bigram at the ln(V) ceiling). All docs pass the quality
    // gate and are lexically distinct, so only the LM stage separates
    // them.
    val corpus = java.nio.file.Files.createTempDirectory("lmcorpus").toString
    Seq(
      (1L, "src0", "the quick brown fox jumps over the lazy dog again"),
      (2L, "src0", "the quick brown fox runs past the lazy dog today"),
      (20L, "web", "the quick brown fox naps near the lazy dog"),
      (21L, "web", "zz qq ww vv kk jj xx yy uu pp"))
      .map { case (id, src, t) => (id, "en", src, t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")

    // pick the cut between the two raw docs' measured scores: the junk
    // doc sits at the unseen ceiling ln(V); in-distribution text is far
    // below it. V here = distinct ref tokens, comfortably < 32 -> use a
    // threshold just under ln(V) by scoring first.
    val scores = graft.operators.CurationOps
      .lmPerplexityOf(spark.read.parquet(s"$corpus/documents.parquet")
        .select("doc_id", "source", "text"), "src0")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(scores(20L) < scores(21L), s"scores: $scores")
    val cut = (scores(20L) + scores(21L)) / 2

    val offOut = java.nio.file.Files.createTempDirectory("lmoff").toString
    CorpusPrep.run(spark, corpus, offOut, CorpusPrep.Config())
    val offStats = spark.read.parquet(s"$offOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(offStats("01b_lm_filter") === -1L, "stage must be off by default")
    val offIds = spark.read.parquet(s"$offOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offIds.contains(21L), "junk doc survives without the LM stage")

    val onOut = java.nio.file.Files.createTempDirectory("lmon").toString
    CorpusPrep.run(spark, corpus, onOut,
      CorpusPrep.Config(lmFilter = true, lmMaxAvgNll = cut))
    val onIds = spark.read.parquet(s"$onOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onIds === offIds - 21L, s"on: $onIds vs off: $offIds")
    val onStats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onStats("01b_lm_filter") === onStats("01_quality_gate") - 1)
  }

  test("clf-filter stage drops the below-threshold doc under the frozen classifier; off by default") {
    import spark.implicits._
    import graft.operators.{Clf, ClfWeights}
    // all three docs pass the quality gate and are lexically distinct;
    // only the frozen classifier's logit separates them — the threshold
    // is picked between two measured scores so the test is independent
    // of what the committed weights happen to be
    val corpus = java.nio.file.Files.createTempDirectory("clfcorpus").toString
    Seq(
      (1L, "src0", "the quick brown fox jumps over the lazy dog again"),
      (20L, "web", "market prices rose while traders watched the board"),
      (21L, "web", "zz qq ww vv kk jj xx yy uu pp"))
      .map { case (id, src, t) => (id, "en", src, t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")
    val scores = Clf.scoreOf(
        spark.read.parquet(s"$corpus/documents.parquet")
          .select("doc_id", "source", "text"),
        Clf.frozen, ClfWeights.Buckets)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit")).toMap
    assert(scores(20L) !== scores(21L), s"degenerate fixture: $scores")
    val (dropId, keepId) =
      if (scores(20L) < scores(21L)) (20L, 21L) else (21L, 20L)
    val cut = (scores(20L) + scores(21L)) / 2

    val offOut = java.nio.file.Files.createTempDirectory("clfoff").toString
    CorpusPrep.run(spark, corpus, offOut, CorpusPrep.Config())
    val offStats = spark.read.parquet(s"$offOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(offStats("01c_clf_filter") === -1L, "stage must be off by default")
    val offIds = spark.read.parquet(s"$offOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offIds.contains(dropId), "below-threshold doc survives with the stage off")

    val onOut = java.nio.file.Files.createTempDirectory("clfon").toString
    CorpusPrep.run(spark, corpus, onOut,
      CorpusPrep.Config(clfFilter = true, clfMinLogit = cut))
    val onIds = spark.read.parquet(s"$onOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the stage must keep EXACTLY the measured at-or-above-cut docs
    // (docs other than the pinned pair fall wherever their logit says)
    val expected = offIds.filter(id => scores(id) >= cut)
    assert(onIds === expected, s"on: $onIds vs expected: $expected")
    assert(onIds.contains(keepId) && !onIds.contains(dropId))
    val onStats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onStats("01c_clf_filter") === onStats("01_quality_gate") - (offIds.size - expected.size))
  }

  test("span-cut stage: extents cut, ownership frontier-local, span-free docs untouched") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val corpus = java.nio.file.Files.createTempDirectory("spancorpus").toString
    Seq(
      // the RAW-corpus first occurrence of the span — but it dies at the
      // quality gate (dup_rate 18/28 > 0.6), so it must NOT claim
      // ownership: were ownership raw-corpus-global, docs 1 AND 2 would
      // both be cut and the span's text would vanish from the corpus
      0L -> s"$span $span $span",
      1L -> span,                              // surviving canonical
      2L -> s"w1 w2 w3 w4 w5 $span z1 z2 z3", // survivor with the copy at 6..15
      3L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9")     // span-free survivor
      .map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")
    def docs(o: String): Map[Long, String] = spark.read.parquet(s"$o/documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val offOut = java.nio.file.Files.createTempDirectory("spanoff").toString
    CorpusPrep.run(spark, corpus, offOut, CorpusPrep.Config(nearDup = false))
    val off = docs(offOut)
    assert(off.keySet === Set(1L, 2L, 3L))
    assert(off(2L).contains(span), "no cut without the stage")

    val onOut = java.nio.file.Files.createTempDirectory("spanon").toString
    CorpusPrep.run(spark, corpus, onOut,
      CorpusPrep.Config(nearDup = false, spanCut = true))
    val on = docs(onOut)
    assert(on.keySet === Set(1L, 2L, 3L))
    assert(on(1L) === span)                      // frontier canonical keeps its text
    assert(on(2L) === "w1 w2 w3 w4 w5 z1 z2 z3") // exactly the copy removed
    assert(on(3L) === off(3L))                   // span-free doc byte-identical
    val stats = spark.read.parquet(s"$onOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("05b_span_cut") === 3L)
    assert(stats("05c_span_mask") === -1L) // the OTHER policy reads off
    assert(stats("05_decontaminate") === 3L) // the cut stage dropped no DOC here
  }

  test("mask-spans stage: extents masked length-stable, provenance columns ride, " +
    "policies mutually exclusive") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val corpus = java.nio.file.Files.createTempDirectory("maskcorpus").toString
    Seq(
      1L -> span,                              // surviving canonical
      2L -> s"w1 w2 w3 w4 w5 $span z1 z2 z3", // survivor with the copy at 6..15
      3L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9")     // span-free survivor
      .map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")

    val out = java.nio.file.Files.createTempDirectory("maskon").toString
    CorpusPrep.run(spark, corpus, out,
      CorpusPrep.Config(nearDup = false, spanMask = true))
    val docs = spark.read.parquet(s"$out/documents")
      .select("doc_id", "text", "n_masked", "mask_frac").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    val mk = operators.CurationOps.MaskToken
    assert(docs.keySet === Set(1L, 2L, 3L))
    assert(docs(1L) === ((span, 0L, 0.0)))       // frontier canonical untouched
    assert(docs(2L)._1 === s"w1 w2 w3 w4 w5 ${Seq.fill(10)(mk).mkString(" ")} z1 z2 z3")
    assert(docs(2L)._2 === 10L)
    assert(docs(3L)._2 === 0L)
    // length stability end-to-end through the job
    docs.foreach { case (id, (t, _, _)) =>
      assert(t.split(" ", -1).length === (id match {
        case 1L => 10; case 2L => 18; case 3L => 9
      }), s"doc $id")
    }
    val stats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the ledger records WHICH policy ran: cut reads off, mask carries
    // the final doc count (nothing dropped — masking is length-stable)
    assert(stats("05b_span_cut") === -1L)
    assert(stats("05c_span_mask") === 3L)
    assert(stats("05c_span_mask_tokens") === 10L)  // the loss-mask budget
    // chunks are built on the MASKED text
    val chunkToks = spark.read.parquet(s"$out/chunks")
      .select("chunk_text").collect().flatMap(_.getString(0).split(" ", -1))
    assert(chunkToks.count(_ == mk) > 0, "chunker must consume the masked text")

    // the two policies cannot both be on
    intercept[IllegalArgumentException] {
      CorpusPrep.run(spark, corpus,
        java.nio.file.Files.createTempDirectory("maskboth").toString,
        CorpusPrep.Config(nearDup = false, spanCut = true, spanMask = true))
    }
  }

  test("semantic stage drops an embedding paraphrase that survives lexical dedup") {
    import spark.implicits._
    // synthetic corpus dir: six lexically DISTINCT docs (no shared 3-grams,
    // distinct hashes — exact and near-dup dedup keep all six) where doc 3
    // is a PARAPHRASE of doc 1: identical embedding, zero shared vocabulary
    val corpus = java.nio.file.Files.createTempDirectory("semcorpus").toString
    val texts = Seq(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel",
      2L -> "one two three four five six seven eight",
      3L -> "aleph bet gimel dalet he vav zayin het",
      4L -> "red orange yellow green blue indigo violet gray",
      5L -> "north south east west up down left right",
      6L -> "cat dog bird fish horse sheep goat cow")
    texts.map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")
    // 64-dim embeddings: basis vectors (pairwise cos = 0) except doc 3,
    // which carries doc 1's direction (cos = 1)
    def basis(dim: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == dim) 1.0f else 0.0f)
    Seq((1L, basis(0)), (2L, basis(7)), (3L, basis(0)),
        (4L, basis(21)), (5L, basis(33)), (6L, basis(45)))
      .map { case (id, v) => (id, "synthetic", v.toSeq) }
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$corpus/embeddings.parquet")

    val semOut = java.nio.file.Files.createTempDirectory("semprep").toString
    CorpusPrep.run(spark, corpus, semOut,
      CorpusPrep.Config(semantic = true, semanticThreshold = 0.9))
    val stats = spark.read.parquet(s"$semOut/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // lexical stages keep all six; the semantic stage drops exactly doc 3
    assert(stats("02_exact_dedup") === 6L && stats("03_neardup_groups") === 6L)
    assert(stats("04_semantic_dedup") === 5L)
    val keptIds = spark.read.parquet(s"$semOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds === Seq(1L, 2L, 4L, 5L, 6L)) // min-id representative kept

    // under the q67b density dial the outcome is identical here: the
    // paraphrase's embedding is IDENTICAL to doc 1's, and identical
    // vectors share every sign block — exact semantic dups cannot escape
    val semOutB = java.nio.file.Files.createTempDirectory("semprepblk").toString
    CorpusPrep.run(spark, corpus, semOutB, CorpusPrep.Config(
      semantic = true, semanticThreshold = 0.9, semanticSubBlockBits = Some(6)))
    assert(spark.read.parquet(s"$semOutB/documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 4L, 5L, 6L))
    // explicit pin is recorded in the stats table
    val statsB = spark.read.parquet(s"$semOutB/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statsB("04b_semantic_bits") === 6L)
  }

  test("semantic stage MEASURES its density dial by default: dense corpus gets non-zero bits in-job") {
    import spark.implicits._
    // 40 lexically distinct docs that are all SEMANTIC copies (identical
    // embedding direction — one dominant cluster of 40 > the 32-member
    // target), plus two singleton-cluster docs. With the retired fixed
    // default of 0 the stage would pair the whole hot cluster unblocked;
    // the auto dial must measure the frontier and pick bits >= 1 — and
    // identical embeddings share every sign block, so the blocked run
    // still drops every dense-cluster copy except the min-id survivor.
    val corpus = java.nio.file.Files.createTempDirectory("semauto").toString
    val dense = (1L to 40L).map(i =>
      (i, s"a$i b$i c$i d$i e$i f$i g$i h$i"))
    val texts = dense ++ Seq(
      98L -> "one two three four five six seven eight",
      99L -> "red orange yellow green blue indigo violet gray")
    texts.map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")
    def basis(dim: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == dim) 1.0f else 0.0f)
    (dense.map { case (id, _) => (id, basis(0)) } ++
      Seq((98L, basis(7)), (99L, basis(21))))
      .map { case (id, v) => (id, "synthetic", v.toSeq) }
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$corpus/embeddings.parquet")

    val outDir = java.nio.file.Files.createTempDirectory("semautoout").toString
    CorpusPrep.run(spark, corpus, outDir,
      CorpusPrep.Config(nearDup = false, semantic = true, semanticThreshold = 0.9))
    val stats = spark.read.parquet(s"$outDir/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the dial was measured, not defaulted: maxPop=40 > 32 -> bits=1
    assert(stats("04b_semantic_bits") === 1L, stats.toString)
    // and the blocked dedup still collapses the dense cluster exactly
    assert(spark.read.parquet(s"$outDir/documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 98L, 99L))
  }

  test("semantic stage keeps a doc whose lower-id representative died at an earlier gate") {
    import spark.implicits._
    // doc 1 fails the quality gate (too short); doc 3 is its semantic
    // paraphrase. Dropping 3 against the FULL embedding table would erase
    // the cluster's content entirely — the drop list must form over the
    // SURVIVORS, so 3 becomes the cluster's representative and is kept.
    val corpus = java.nio.file.Files.createTempDirectory("semsurv").toString
    val texts = Seq(
      1L -> "tiny", // < minTokens: dies at the quality gate
      2L -> "one two three four five six seven eight",
      3L -> "aleph bet gimel dalet he vav zayin het",
      4L -> "red orange yellow green blue indigo violet gray")
    texts.map { case (id, t) => (id, "en", "web", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$corpus/documents.parquet")
    def basis(dim: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == dim) 1.0f else 0.0f)
    Seq((1L, basis(0)), (2L, basis(7)), (3L, basis(0)), (4L, basis(21)))
      .map { case (id, v) => (id, "synthetic", v.toSeq) }
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$corpus/embeddings.parquet")

    val semOut = java.nio.file.Files.createTempDirectory("semsurvout").toString
    CorpusPrep.run(spark, corpus, semOut,
      CorpusPrep.Config(semantic = true, semanticThreshold = 0.9))
    val keptIds = spark.read.parquet(s"$semOut/documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds === Seq(2L, 3L, 4L)) // 1 gated out, 3 SURVIVES as the new rep
  }

  test("kept documents pass the gates and contain no duplicates of any kind") {
    val docs = spark.read.parquet(s"$out/documents")
    assert(docs.filter(col("n_tokens") < 5 || col("dup_rate") > 0.6).count() === 0)
    // exact: content hashes unique
    assert(docs.select(md5(col("text").cast("binary"))).distinct().count() === docs.count())
    // near-dup: no two kept docs share a MinHash connected component
    val canon = DedupOps.dedupGroups(spark, sf)
      .select(col("doc_id"), col("canonical"))
    val perComponent = docs.join(canon, "doc_id")
      .groupBy("canonical").count().filter(col("count") > 1).count()
    assert(perComponent === 0, "two kept docs share a near-dup component")
  }

  test("chunks cover every kept doc and respect the window") {
    val docs = spark.read.parquet(s"$out/documents")
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.select("doc_id").distinct().count() === docs.count())
    assert(chunks.filter(col("n_chunk_tokens") < 1 || col("n_chunk_tokens") > 32).count() === 0)
    // chunk_no 0 exists for every doc; text token count matches the recorded one
    assert(chunks.filter(col("chunk_no") === 0).count() === docs.count())
    val bad = chunks
      .withColumn("actual", size(split(col("chunk_text"), " ")).cast("long"))
      .filter(col("actual") =!= col("n_chunk_tokens"))
    assert(bad.count() === 0)
  }
}
