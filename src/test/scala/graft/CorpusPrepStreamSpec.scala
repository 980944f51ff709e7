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
        "00_input" -> 6L, "01_quality_gate" -> 5L, "02_exact_dedup" -> 4L,
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
        "00_input" -> 3L, "01_quality_gate" -> 3L, "02_exact_dedup" -> 2L,
        "03_neardup_guard" -> 1L, "04_decontaminate" -> 1L), att2.toString)
    } finally q.stop()
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
}
