package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.jobs.LakeLayout

class LakeLayoutSpec extends SparkSpec {

  test("day-partitioned layout prunes partitions at planning time") {
    val lake = Files.createTempDirectory("lake").toString
    LakeLayout.writeEventsPartitioned(spark, sf, lake)

    // physical layout: one directory per day
    val dirs = new java.io.File(lake).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("day=")))

    val day = dirs.head.stripPrefix("day=")
    val df = LakeLayout.readDay(spark, lake, day)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the day predicate must be a partition filter, not a data filter
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)

    // row counts reconcile with the unpartitioned source
    val expected = Tables.events(spark, sf)
      .withColumn("day", date_format(timestamp_micros(call_function("div", col("ts"), lit(1000L))), "yyyy-MM-dd"))
      .filter(col("day") === day).count()
    assert(df.count() === expected)
  }

  test("upsertEvents(): touched day rewritten, every other partition byte-identical") {
    import spark.implicits._
    val lake = Files.createTempDirectory("upsert").toString
    LakeLayout.writeEventsPartitioned(spark, sf, lake)

    def listing(): Map[String, Seq[(String, Long)]] =
      new java.io.File(lake).listFiles().filter(_.getName.startsWith("day=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSeq.sorted
      }.toMap
    val before = listing()
    val days = before.keys.toSeq.sorted
    assert(days.size >= 2, s"need >=2 day partitions, got $days")

    // a correction batch inside ONE day: rewrite one event, add one new one
    val victim = spark.read.parquet(lake)
      .filter(col("day") === days.head.stripPrefix("day="))
      .orderBy("event_id").limit(1)
      .select("event_id", "ts", "user_id", "event_type", "value", "props").collect()(0)
    val batch = Seq(
      (victim.getLong(0), victim.getLong(1), victim.getLong(2), "corrected", 99.5, "{}"),
      (900000L, victim.getLong(1) + 1L, 7L, "late_arrival", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val total = spark.read.parquet(lake).count()
    LakeLayout.upsertEvents(spark, lake, batch)

    // untouched partitions: identical file names AND sizes
    val after = listing()
    days.tail.foreach(d => assert(after(d) === before(d), s"partition $d was rewritten"))
    assert(after(days.head) !== before(days.head), "touched partition not rewritten")

    val now = spark.read.parquet(lake)
    assert(now.count() === total + 1) // one replaced, one added
    val got = now.filter(col("event_id") === victim.getLong(0)).collect()
    assert(got.length === 1 && got(0).getAs[String]("event_type") === "corrected")
    assert(now.filter(col("event_id") === 900000L).count() === 1)
  }

  test("z-order layout: per-file stats stay tight on BOTH dimensions") {
    val zdir = Files.createTempDirectory("zorder").toString + "/events"
    val tdir = Files.createTempDirectory("tsorted").toString + "/events"
    LakeLayout.writeEventsZOrdered(spark, sf, zdir, files = 8)
    // the one-dimensional strawman: same file count, range-clustered on ts only
    Tables.events(spark, sf)
      .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.parquet(tdir)

    // rows survive the rewrite bit-for-bit (ids are a permutation)
    val src = Tables.events(spark, sf).count()
    assert(spark.read.parquet(zdir).count() === src)

    // a narrow user_id slice (~10% of the id range): count how many FILES'
    // min/max user_id interval intersects it — that is exactly the
    // row-group population a stats-pruning reader must touch
    def touchedFiles(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val bounds = spark.read.parquet(dir).agg(min("user_id"), max("user_id")).collect()(0)
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val cut = lo + math.max(1L, (hi - lo) / 10)
      (spans.count { case (mn, mx) => mn <= cut && lo <= mx }, files.length)
    }
    val (zTouched, zFiles) = touchedFiles(zdir)
    val (tTouched, tFiles) = touchedFiles(tdir)
    // ts-only clustering leaves user_id unclustered: every file intersects
    assert(tTouched === tFiles, s"strawman unexpectedly clustered: $tTouched/$tFiles")
    // z-order confines the slice to a minority of files
    assert(zTouched.toDouble / zFiles <= 0.5, s"z-order touched $zTouched/$zFiles files")
  }

  test("compact(): collapses a many-small-files table, rows preserved") {
    val dir = Files.createTempDirectory("compact").toString + "/events"
    Tables.events(spark, sf).repartition(20).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before === 20)
    val rows = spark.read.parquet(dir).count()

    LakeLayout.compact(spark, dir, targetFileBytes = 512L << 20)
    assert(parquetFiles === 1) // everything fits one target-sized file
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("compact(): preserves a batch-partitioned stream lake and survives the next append") {
    // the BagIngestStream layout: one batch=<id>/ directory per micro-batch
    val dir = Files.createTempDirectory("compact-part").toString + "/frame_index"
    val events = Tables.events(spark, sf).limit(200)
    events.withColumn("batch", lit(0L)).repartition(5)
      .write.partitionBy("batch").mode("append").parquet(dir)
    events.withColumn("batch", lit(1L)).repartition(5)
      .write.partitionBy("batch").mode("append").parquet(dir)
    val rows = spark.read.parquet(dir).count()

    LakeLayout.compact(spark, dir, targetFileBytes = 512L << 20)

    // layout intact: still batch=<id> leaves, one file each, no strays at root
    val root = new java.io.File(dir)
    assert(root.listFiles().count(_.getName.endsWith(".parquet")) === 0,
      "compaction must not flatten data files into the table root")
    val leafDirs = root.listFiles().filter(f => f.isDirectory && !f.getName.startsWith("_"))
    assert(leafDirs.map(_.getName).sorted.toSeq === Seq("batch=0", "batch=1"))
    leafDirs.foreach(d => assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1))

    // batch stays a partition column and rows survive
    val compacted = spark.read.parquet(dir)
    assert(compacted.count() === rows)
    // partition discovery re-infers batch (as int) from the directory names
    assert(compacted.select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))

    // the stream appends the next micro-batch — the table must stay readable
    events.withColumn("batch", lit(2L))
      .write.partitionBy("batch").mode("append").parquet(dir)
    val after = spark.read.parquet(dir)
    assert(after.count() === rows + events.count())
    assert(after.select("batch").distinct().count() === 3)
  }

  test("bucketed layout: join + agg on the bucket key plans with zero shuffle") {
    LakeLayout.writeOrdersCustomerBucketed(spark, sf, buckets = 4)
    // force the shuffle-join path: broadcast would mask the bucketing win
    val originalThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = LakeLayout.bucketedOrderRollup(spark)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // results reconcile with the plain-parquet equivalent
      val expected = Tables.orders(spark, sf)
        .groupBy("o_custkey").count().join(
          Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
      assert(df.count() === expected)
    } finally {
      // restore the SESSION's configured value (GraftSession sets 64MB) —
      // the session is shared across suites
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", originalThreshold)
    }
  }
}
