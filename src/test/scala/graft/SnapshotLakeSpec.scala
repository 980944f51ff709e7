package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.jobs.SnapshotLake

import java.nio.file.Files

/** Snapshot-isolated lake: commit/read/time-travel/compaction/expiry. */
class SnapshotLakeSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("snaplake").resolve("t").toString

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("append/overwrite commits version linearly; every snapshot stays readable") {
    val t = freshTable()
    assert(SnapshotLake.commitAppend(spark, t, batch(0, 10)) === 1L)
    assert(SnapshotLake.commitAppend(spark, t, batch(10, 25)) === 2L)
    assert(SnapshotLake.commitOverwrite(spark, t, batch(100, 105)) === 3L)
    assert(SnapshotLake.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(ids(SnapshotLake.read(spark, t)) === (100L until 105L))
    assert(ids(SnapshotLake.read(spark, t, Some(1))) === (0L until 10L))
    assert(ids(SnapshotLake.read(spark, t, Some(2))) === (0L until 25L))
  }

  test("LATEST pointer: O(1) latest discovery, probe recovery, listing fallback") {
    val t = freshTable()
    (0 until 3).foreach(i => SnapshotLake.commitAppend(spark, t, batch(i * 10, i * 10 + 10)))
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(root, "_log/LATEST")
    def writePtr(s: String): Unit = {
      val out = fs.create(ptr, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    def readPtr(): String = {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    }
    // fresh pointer: every publish bumped it; discovery pays exactly 2
    // existence probes (hit v3, miss v4) and never lists the log dir
    assert(readPtr() === "3")
    assert(SnapshotLake.latestVersionInstrumented(fs, root) === (Some(3L), 2, false))
    // stale pointer (a writer died before its bump): forward probes walk
    // to the true latest — 4 probes for a 2-version lag, still no listing
    writePtr("1")
    assert(SnapshotLake.latestVersionInstrumented(fs, root) === (Some(3L), 4, false))
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 30L)) // reads v3 data
    // and the next commit re-bumps the pointer past the stale value
    SnapshotLake.commitAppend(spark, t, batch(30, 35))
    assert(readPtr() === "4")
    // DANGLING pointer (names an unpublished version): one wasted probe,
    // then the listing fallback still finds the truth
    writePtr("99")
    assert(SnapshotLake.latestVersionInstrumented(fs, root) === (Some(4L), 1, true))
    // corrupt pointer: no probes, listing fallback
    writePtr("not-a-number")
    assert(SnapshotLake.latestVersionInstrumented(fs, root) === (Some(4L), 0, true))
    // absent pointer (legacy table): listing fallback, reads still work
    fs.delete(ptr, false)
    assert(SnapshotLake.latestVersionInstrumented(fs, root) === (Some(4L), 0, true))
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 35L))
  }

  test("compaction commits a new version; older snapshots are untouched") {
    val t = freshTable()
    (0 until 5).foreach(i => SnapshotLake.commitAppend(spark, t, batch(i * 10, i * 10 + 10)))
    val before = ids(SnapshotLake.read(spark, t))
    val v = SnapshotLake.commitCompacted(spark, t)
    assert(v === Some(6L))
    assert(ids(SnapshotLake.read(spark, t)) === before)
    // rewrite actually shrank the file count to 1 (tiny data, huge target)
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesOf(v: Long): Seq[String] = {
      val in = fs.open(new Path(root, f"_log/v$v%08d.manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
      finally in.close()
    }
    assert(filesOf(6L).size === 1 && filesOf(5L).size > 1)
    // time travel to the pre-compaction snapshot still works
    assert(ids(SnapshotLake.read(spark, t, Some(5))) === before)
  }

  test("expire drops old versions and exactly the files no retained snapshot needs") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10))   // v1
    SnapshotLake.commitAppend(spark, t, batch(10, 20))  // v2 (shares v1's files)
    SnapshotLake.commitOverwrite(spark, t, batch(50, 55)) // v3 (fresh files only)
    SnapshotLake.commitAppend(spark, t, batch(55, 60))  // v4
    val (dropped, deleted) = SnapshotLake.expire(spark, t, keepLast = 2)
    assert(dropped === 2)
    assert(deleted > 0) // v1/v2's files are unreferenced by v3/v4
    assert(SnapshotLake.versions(spark, t) === Seq(3L, 4L))
    assert(ids(SnapshotLake.read(spark, t, Some(3))) === (50L until 55L))
    assert(ids(SnapshotLake.read(spark, t)) === (50L until 60L))
    intercept[IllegalArgumentException] { SnapshotLake.read(spark, t, Some(1)) }
  }

  test("a commit losing the version race rebases and lands on the next version") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10)) // v1
    // squat on v2: the writer must detect the lost race and publish v3
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val squatted = new Path(root, "_log/v00000002.manifest")
    val out = fs.create(squatted, false)
    // the squatter re-publishes v1's file list (a no-op commit)
    val in = fs.open(new Path(root, "_log/v00000001.manifest"))
    try out.write(scala.io.Source.fromInputStream(in, "UTF-8").mkString.getBytes("UTF-8"))
    finally { in.close(); out.close() }
    val v = SnapshotLake.commitAppend(spark, t, batch(10, 20))
    assert(v === 3L)
    // the append rebased on the squatter's v2 — nothing lost
    assert(ids(SnapshotLake.read(spark, t, Some(3))) === (0L until 20L))
  }

  test("readRange prunes files from manifest stats alone") {
    val t = freshTable()
    // 4 commits with disjoint id ranges -> per-file min/max are disjoint
    (0 until 4).foreach { i =>
      SnapshotLake.commitAppend(spark, t,
        batch(i * 100, i * 100 + 50).repartition(2), statsCol = Some("id"))
    }
    val all = SnapshotLake.read(spark, t)
    val total = all.inputFiles.length
    assert(total >= 8)
    val narrow = SnapshotLake.readRange(spark, t, "id", 210, 230)
    // only commit #2's files survive the manifest prune
    assert(narrow.inputFiles.length <= total / 4)
    assert(ids(narrow) === (210L to 230L))
    // empty range: zero rows, schema intact, no correctness loss
    val none = SnapshotLake.readRange(spark, t, "id", 5000, 6000)
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "payload"))
    // range spanning everything returns every row
    assert(ids(SnapshotLake.readRange(spark, t, "id", 0, 1000)) === ids(all))
  }

  test("readRangeIn prunes to the files containing ANY probed value, one manifest read") {
    val t = freshTable()
    // 4 commits with disjoint id ranges -> per-file min/max are disjoint
    (0 until 4).foreach { i =>
      SnapshotLake.commitAppend(spark, t,
        batch(i * 100, i * 100 + 50).repartition(2), statsCol = Some("id"))
    }
    val all = SnapshotLake.read(spark, t)
    val total = all.inputFiles.length
    // values from commits #0 and #3 only: #1/#2's files must be pruned
    val hit = SnapshotLake.readRangeIn(spark, t, "id", Seq(10L, 330L))
    assert(hit.inputFiles.length <= total / 2)
    assert(ids(hit) === Seq(10L, 330L))
    // values outside every range: zero rows, schema intact
    val none = SnapshotLake.readRangeIn(spark, t, "id", Seq(5000L))
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "payload"))
    intercept[IllegalArgumentException] {
      SnapshotLake.readRangeIn(spark, t, "id", Seq.empty)
    }
  }

  test("mixed-stats history disables pruning rather than corrupting it") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 50), statsCol = Some("id"))
    SnapshotLake.commitAppend(spark, t, batch(50, 100)) // no stats declared
    // header dropped -> readRange must scan everything but stay correct
    val out = SnapshotLake.readRange(spark, t, "id", 20, 70)
    assert(ids(out) === (20L to 70L))
    assert(out.inputFiles.length === SnapshotLake.read(spark, t).inputFiles.length)
  }

  test("streaming ingest: one snapshot per micro-batch, re-delivered batch skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("snapckpt").toString
    val mem = MemoryStream[Long]
    val q = SnapshotLake.appendStream(
      mem.toDF().withColumnRenamed("value", "id"), t, ckpt, statsCol = Some("id"))
    try {
      mem.addData(1L, 2L, 3L); q.processAllAvailable()
      mem.addData(4L, 5L); q.processAllAvailable()
      assert(SnapshotLake.versions(spark, t) === Seq(1L, 2L))
      assert(ids(SnapshotLake.read(spark, t).select("id")) === Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
    // crash-retry: the same micro-batch id re-commits -> no new version
    val v = SnapshotLake.commitStreamBatch(spark, t,
      batch(4, 6).select(col("id")), batchId = 1L, statsCol = Some("id"))
    assert(v === 2L)
    assert(SnapshotLake.versions(spark, t) === Seq(1L, 2L))
  }

  test("schema evolution: a later commit's new column reads as null in old files") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 5)) // id, payload
    SnapshotLake.commitAppend(spark, t,
      (5 until 8).map(i => (i.toLong, s"row$i", s"src$i")).toDF("id", "payload", "origin"))
    val merged = SnapshotLake.read(spark, t, mergeSchema = true)
    assert(merged.columns.toSet === Set("id", "payload", "origin"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("origin")).toMap
    assert(byId(0L) === null && byId(6L) === "src6")
    // time travel before the evolution sees the original schema
    assert(SnapshotLake.read(spark, t, Some(1L)).columns.toSet === Set("id", "payload"))
  }

  test("a crashed writer's stale claim fails commits loudly until recovered") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10)) // v1
    // simulate a writer that died between claim and manifest
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(root, "_log/v00000002.claim"), false).close()
    System.setProperty("graft.snapshot.pendingWaitMs", "300")
    try intercept[IllegalStateException] {
      SnapshotLake.commitAppend(spark, t, batch(10, 20))
    } finally System.clearProperty("graft.snapshot.pendingWaitMs")
    // recovery: the claim never published data, dropping it is safe
    assert(SnapshotLake.recoverAbandonedClaims(spark, t, olderThanMs = 0L) === Seq(2L))
    val v = SnapshotLake.commitAppend(spark, t, batch(10, 20))
    assert(v === 2L)
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 20L))
  }

  test("8 writers race concurrently: no commit lost, versions linear") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val t = freshTable()
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = Future.sequence((0 until 8).map { i =>
        Future(SnapshotLake.commitAppend(spark, t, batch(i * 100, i * 100 + 10)))
      })
      val versions = Await.result(commits, 120.seconds)
      // every writer won a DISTINCT version and the log is dense 1..8
      assert(versions.sorted == (1L to 8L))
      assert(SnapshotLake.versions(spark, t) === (1L to 8L))
      // the latest snapshot contains every writer's rows — nothing clobbered
      val all = ids(SnapshotLake.read(spark, t))
      assert(all === (0 until 8).flatMap(i => (i * 100L) until (i * 100L + 10)).sorted)
      // each intermediate version is a strict superset chain (append-only)
      val sizes = (1L to 8L).map(v => SnapshotLake.read(spark, t, Some(v)).count())
      assert(sizes === (1L to 8L).map(_ * 10))
    } finally pool.shutdown()
  }

  test("readRangeString prunes files from string manifest stats (date-partition needle)") {
    import spark.implicits._
    val t = freshTable()
    // 4 commits, each a distinct day — per-file string min/max are disjoint
    val days = Seq("2024-01-05", "2024-02-11", "2024-03-17", "2024-04-23")
    days.zipWithIndex.foreach { case (d, i) =>
      val df = (0 until 40).map(j => (i * 100L + j, d, s"cam${j % 3}"))
        .toDF("id", "day", "camera").repartition(2)
      SnapshotLake.commitAppend(spark, t, df, statsCol = Some("day"))
    }
    val all = SnapshotLake.read(spark, t)
    val total = all.inputFiles.length
    assert(total >= 8)
    val narrow = SnapshotLake.readRangeString(spark, t, "day", "2024-02-01", "2024-02-28")
    assert(narrow.inputFiles.length <= total / 4) // only the Feb commit's files scan
    assert(narrow.count() === 40)
    assert(narrow.select("day").distinct().as[String].collect().toSeq === Seq("2024-02-11"))
    // empty range: zero rows, schema survives
    val none = SnapshotLake.readRangeString(spark, t, "day", "2030-01-01", "2030-12-31")
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "day", "camera"))
    // spanning range: every row, correctness never traded for pruning
    assert(SnapshotLake.readRangeString(spark, t, "day", "2024-01-01", "2024-12-31").count()
      === all.count())
    // a LONG readRange against the string-stats snapshot must not prune
    // (kind mismatch -> full scan, still correct)
    assert(SnapshotLake.readRange(spark, t, "id", 100, 150).count() === 40)
  }

  test("an empty micro-batch does not disable stats pruning for the table") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 50).repartition(2), statsCol = Some("id"))
    SnapshotLake.commitAppend(spark, t, batch(100, 150).repartition(2), statsCol = Some("id"))
    // the routine foreachBatch case: same declared column, zero rows →
    // no footer stats to realize, but the snapshot must KEEP its spec
    val empty = Seq.empty[(Long, String)].toDF("id", "payload")
    SnapshotLake.commitStreamBatch(spark, t, empty, batchId = 9L, statsCol = Some("id"))
    // commit 1's stats-bearing files must still prune (the empty batch's
    // own stats-less file is scan-always by design, so compare against
    // the no-pruning outcome, not an absolute count)
    val total = SnapshotLake.read(spark, t).inputFiles.length
    val narrow = SnapshotLake.readRange(spark, t, "id", 110, 120)
    assert(narrow.inputFiles.length < total - 1, "empty batch killed pruning")
    assert(ids(narrow) === (110L to 120L))
  }

  test("empty-string bounds survive the manifest round-trip (trailing-tab parse)") {
    import spark.implicits._
    val t = freshTable()
    // a whole commit of empty-string values: per-file min = max = "" →
    // the manifest line ends in two tabs, which a default split() would
    // swallow, misparsing path+tabs as the file path
    Seq((1L, ""), (2L, "")).toDF("id", "day")
      .coalesce(1).write.parquet(t + "-src")
    SnapshotLake.commitAppend(spark, t, spark.read.parquet(t + "-src"),
      statsCol = Some("day"))
    SnapshotLake.commitAppend(spark, t,
      Seq((3L, "2024-05-05")).toDF("id", "day"), statsCol = Some("day"))
    // table stays readable and the empty-bound file prunes correctly
    assert(SnapshotLake.read(spark, t).count() === 3)
    val hit = SnapshotLake.readRangeString(spark, t, "day", "", "")
    assert(hit.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val may = SnapshotLake.readRangeString(spark, t, "day", "2024-01-01", "2024-12-31")
    assert(may.select("id").as[Long].collect().toSeq === Seq(3L))
    assert(may.inputFiles.length === 1) // the empty-bound file was pruned
  }

  test("a failed publish cleans up its staged data directory") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10)) // v1
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Int = fs.listStatus(new Path(root, "data")).count(_.isDirectory)
    val before = dataDirs()
    // wedge the log with a stale claim so publish() throws after staging
    fs.create(new Path(root, "_log/v00000002.claim"), false).close()
    System.setProperty("graft.snapshot.pendingWaitMs", "300")
    try intercept[IllegalStateException] {
      SnapshotLake.commitAppend(spark, t, batch(10, 20))
    } finally System.clearProperty("graft.snapshot.pendingWaitMs")
    // the orphan parquet staged by the failed commit is gone, not leaked
    assert(dataDirs() === before)
  }

  test("a compaction losing the race publishes NOTHING and leaves no orphans") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10))  // v1
    SnapshotLake.commitAppend(spark, t, batch(10, 20)) // v2
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Int = fs.listStatus(new Path(root, "data")).count(_.isDirectory)
    val before = dataDirs()
    // a foreign append lands in the stage->publish window
    val v = SnapshotLake.commitCompacted(spark, t, 128L << 20,
      () => { SnapshotLake.commitAppend(spark, t, batch(20, 30)); () })
    assert(v === None)
    // no redundant no-op version: the log holds exactly v1,v2 + the racer's v3
    assert(SnapshotLake.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 30L))
    // the abandoned rewrite's staged dir was deleted (racer added exactly one)
    assert(dataDirs() === before + 1)
    // and a re-run compaction off the new latest succeeds
    assert(SnapshotLake.commitCompacted(spark, t) === Some(4L))
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 30L))
  }

  test("commitRewrite: row-level rewrite, stats preserved, raced commit abandons") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10), statsCol = Some("id"))
    SnapshotLake.commitAppend(spark, t, batch(10, 20), statsCol = Some("id"))
    // the fold: drop even ids; stats column carries over from the base
    assert(SnapshotLake.commitRewrite(spark, t, _.filter(col("id") % 2 === 1)) === Some(3L))
    assert(ids(SnapshotLake.read(spark, t)) === (1L until 20L by 2))
    // manifest pruning still works off the preserved stats spec
    assert(ids(SnapshotLake.readRange(spark, t, "id", 3L, 7L)) === Seq(3L, 5L, 7L))
    // published versions untouched (time travel)
    assert(ids(SnapshotLake.read(spark, t, Some(2))) === (0L until 20L))
    // a foreign commit in the stage->publish window: abandon, never drop it
    val raced = SnapshotLake.commitRewrite(spark, t, _.filter(col("id") > 100), None,
      () => { SnapshotLake.commitAppend(spark, t, batch(20, 25), statsCol = Some("id")); () })
    assert(raced === None)
    assert(ids(SnapshotLake.read(spark, t)) === ((1L until 20L by 2) ++ (20L until 25L)).sorted)
  }

  test("commitRewrite to EMPTY keeps the stats spec: later appends still prune") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10), statsCol = Some("id"))
    // full turnover: every row rewritten away — the staged output carries
    // no footer stats, but the table's spec must survive
    assert(SnapshotLake.commitRewrite(spark, t, _.filter(col("id") < 0)) === Some(2L))
    assert(SnapshotLake.read(spark, t).count() === 0)
    SnapshotLake.commitAppend(spark, t, batch(20, 30), statsCol = Some("id"))
    SnapshotLake.commitAppend(spark, t, batch(40, 50), statsCol = Some("id"))
    val pruned = SnapshotLake.readRange(spark, t, "id", 41L, 45L)
    assert(ids(pruned) === (41L to 45L))
    // manifest pruning still skips the 20-30 file — had the empty rewrite
    // dropped the spec, mergedSpec would have disabled pruning for good
    // and every file of the table would open here
    assert(pruned.inputFiles.length < SnapshotLake.read(spark, t).inputFiles.length,
      pruned.inputFiles.mkString(", "))
  }

  test("commits on non-atomic-create schemes are rejected up front") {
    intercept[IllegalArgumentException] {
      SnapshotLake.commitAppend(spark, "s3a://some-bucket/table", batch(0, 5))
    }
    intercept[IllegalArgumentException] {
      SnapshotLake.commitStreamBatch(spark, "gs://some-bucket/table", batch(0, 5), batchId = 0L)
    }
  }

  test("table properties: set on commit, carried across every commit kind, per-version") {
    val t = freshTable()
    SnapshotLake.commitOverwrite(spark, t, batch(0, 10), statsCol = Some("id"),
      props = Map("coding" -> "raw", "owner" -> "graft"))
    assert(SnapshotLake.propsOf(spark, t) === Map("coding" -> "raw", "owner" -> "graft"))
    // append WITHOUT props: base properties carry forward (a tombstone
    // append must not strip the index's coding)
    SnapshotLake.commitAppend(spark, t, batch(10, 15), statsCol = Some("id"))
    assert(SnapshotLake.propsOf(spark, t) === Map("coding" -> "raw", "owner" -> "graft"))
    // rewrite + compaction preserve them too (publish-level carry, not
    // caller cooperation)
    assert(SnapshotLake.commitRewrite(spark, t, df => df.filter(col("id") < 12)).nonEmpty)
    assert(SnapshotLake.propsOf(spark, t) === Map("coding" -> "raw", "owner" -> "graft"))
    SnapshotLake.commitCompacted(spark, t)
    assert(SnapshotLake.propsOf(spark, t) === Map("coding" -> "raw", "owner" -> "graft"))
    // stream batches as well
    SnapshotLake.commitStreamBatch(spark, t, batch(20, 22), batchId = 7L)
    assert(SnapshotLake.propsOf(spark, t) === Map("coding" -> "raw", "owner" -> "graft"))
    // override replaces ONE key, keeps the rest; old versions still carry
    // what they were committed with (time travel reads v1's properties)
    val vLast = SnapshotLake.commitOverwrite(spark, t, batch(0, 5),
      props = Map("coding" -> "residual"))
    assert(SnapshotLake.propsOf(spark, t, Some(vLast)) ===
      Map("coding" -> "residual", "owner" -> "graft"))
    assert(SnapshotLake.propsOf(spark, t, Some(1L)) ===
      Map("coding" -> "raw", "owner" -> "graft"))
    // malformed keys/values rejected up front
    intercept[IllegalArgumentException] {
      SnapshotLake.commitAppend(spark, t, batch(0, 1), props = Map("a=b" -> "x"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLake.commitAppend(spark, t, batch(0, 1), props = Map("k" -> "a\nb"))
    }
  }

  test("a staged-but-unpublished write is invisible to readers") {
    val t = freshTable()
    SnapshotLake.commitAppend(spark, t, batch(0, 10))
    // simulate a crashed writer: data files exist, no manifest names them
    batch(900, 950).write.parquet(t + "/data/orphan-crashed-commit")
    assert(ids(SnapshotLake.read(spark, t)) === (0L until 10L))
  }
}
