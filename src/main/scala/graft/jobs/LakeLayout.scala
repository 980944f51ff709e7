package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lake layout utilities (SURVEY.md §4): day-partitioned, time-sorted
  * event storage so time-range queries prune partitions at planning time
  * and range scans read sorted row groups — the difference between touching
  * 100 TB and touching one day of it.
  */
object LakeLayout {

  /** The partitioning column: event day derived from the int64-nanos ts. */
  private def dayOf(ts: Column): Column =
    date_format(timestamp_micros(call_function("div", ts, lit(1000L))), "yyyy-MM-dd")

  /** Write events day-partitioned (`day=YYYY-MM-DD/`) and sorted by ts
    * within each file. Sorting within partitions gives parquet min/max
    * row-group statistics real selectivity for ts predicates.
    */
  def writeEventsPartitioned(spark: SparkSession, sfDir: String, out: String): Unit =
    Tables.events(spark, sfDir)
      .withColumn("day", dayOf(col("ts")))
      .repartition(col("day"))
      .sortWithinPartitions("ts")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(out)

  /** Upsert a correction/late batch into the day-partitioned lake, touching
    * ONLY the day directories the batch lands in: per touched day, the new
    * content is (existing rows whose event_id is not replaced) ∪ batch —
    * every other partition's files are left byte-identical. At 100 TB this
    * is the difference between rewriting a table and rewriting an
    * afternoon: work scales with the size of the touched days, not the
    * lake.
    *
    * Mechanics: the merged days are staged to an underscore-prefixed
    * sibling (invisible to partition discovery), then each day directory is
    * swapped in with the same two-rename crash-safe dance as [[compact]] —
    * which also sidesteps writing over an input path mid-job. Same
    * single-writer maintenance-window contract as compact. The touched-day
    * list is a driver collect, bounded by the calendar, not the data.
    *
    * CONTRACT — keys are day-scoped: dedup-by-event_id happens within the
    * batch's own day partitions, because ts (the partition key) is event
    * time and is assumed immutable for a given event_id. A "correction"
    * that MOVES an event across a day boundary is out of scope: the old
    * day is not in the touched set, so the prior row would survive as a
    * duplicate. Cross-day moves need an explicit delete of the old day's
    * row (or route the table through [[SnapshotLake]], where an overwrite
    * commit replaces the full file set atomically).
    */
  def upsertEvents(spark: SparkSession, lake: String, batch: DataFrame): Unit = {
    val withDay = batch.withColumn("day", dayOf(col("ts")))
    val days = withDay.select("day").distinct().collect().map(_.getString(0)).sorted
    if (days.isEmpty) return
    val existing = spark.read.parquet(lake).filter(col("day").isin(days: _*))
      .select(withDay.columns.map(col): _*) // align column order for the union
    val merged = existing
      .join(withDay.select("event_id"), Seq("event_id"), "left_anti")
      .unionByName(withDay)
      .repartition(col("day"))
      .sortWithinPartitions("ts")

    val root = new org.apache.hadoop.fs.Path(lake)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, "_upsert-tmp")
    fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(tmp.toString)
    days.foreach { d =>
      val live = new org.apache.hadoop.fs.Path(root, s"day=$d")
      val staged = new org.apache.hadoop.fs.Path(tmp, s"day=$d")
      val old = new org.apache.hadoop.fs.Path(root, s"_day=$d.upsert-old")
      fs.delete(old, true)
      if (fs.exists(live))
        require(fs.rename(live, old), s"upsert: could not stage old partition $live")
      require(fs.rename(staged, live), s"upsert swap failed for $live (old data at $old)")
      fs.delete(old, true)
    }
    fs.delete(tmp, true)
  }

  /** Read back with a day predicate — Catalyst turns it into a partition
    * filter, so only the matching directories are listed/scanned.
    */
  def readDay(spark: SparkSession, lake: String, day: String): DataFrame =
    spark.read.parquet(lake).filter(col("day") === day)

  /** Small-file compaction — the maintenance pass every continuously-fed
    * lake needs (BagIngestStream appends one file set per micro-batch; a
    * year of micro-batches is millions of tiny files whose open/footer
    * costs dominate scans). Each LEAF data directory — the table root for a
    * flat table, every `col=value/` leaf for a partitioned one — is
    * rewritten in place to ceil(bytes/target) files via coalesce (no
    * shuffle), so the partition layout survives and the stream can keep
    * appending `batch=<id>/` directories afterward. Staging directories are
    * underscore-prefixed siblings (Spark's file index ignores `_`/`.`
    * names, so a concurrent reader never sees them as data or partitions);
    * the swap is two renames (atomic on HDFS/POSIX), with the old data kept
    * as `_<name>.compact-old` until the swap succeeds, so a crash never
    * strands a leaf with no data.
    *
    * Single-writer contract: run in a maintenance window — a plain parquet
    * directory has no snapshot isolation, so files appended between the
    * input listing and the swap would be lost, and readers can transiently
    * miss a leaf between the two renames. (Concurrent-safe compaction
    * is what table formats with a transaction log are for.) Returns the
    * new total data-file count.
    */
  def compact(spark: SparkSession, dir: String, targetFileBytes: Long = 128L << 20): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Leaf data directories: every directory holding at least one visible
    // data file. Hidden (`_`/`.`) files and dirs — _SUCCESS markers, staging
    // leftovers — are neither data nor descended into.
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(p).filterNot { st =>
        st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")
      }
      val here = if (entries.exists(_.isFile)) Seq(p) else Seq.empty
      here ++ entries.filter(_.isDirectory).flatMap(st => leaves(st.getPath))
    }
    leaves(root).map(compactLeaf(spark, fs, _, targetFileBytes)).sum
  }

  private def compactLeaf(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      leaf: org.apache.hadoop.fs.Path, targetFileBytes: Long): Int = {
    val bytes = fs.listStatus(leaf).filter(_.isFile).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // underscore prefix keeps the staging dirs invisible to partition
    // discovery while they sit next to the leaf inside the table tree
    val tmp = new org.apache.hadoop.fs.Path(leaf.getParent, "_" + leaf.getName + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(leaf.getParent, "_" + leaf.getName + ".compact-old")
    fs.delete(tmp, true); fs.delete(old, true)
    // reading the leaf directly sees only its files — partition values live
    // in the directory names above it and are not rewritten into the data
    spark.read.parquet(leaf.toString).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(leaf, old), s"compaction: could not stage old data for $leaf")
    require(fs.rename(tmp, leaf), s"compaction swap failed for $leaf (old data at $old)")
    fs.delete(old, true)
    nFiles
  }

  /** Scale a long column's [mn, mx] range to a 16-bit rank. Double math is
    * fine here: the rank only steers file placement (layout quality), it
    * carries no query-correctness contract.
    */
  private def rank16(c: Column, mn: Long, mx: Long): Column =
    if (mx == mn) lit(0L)
    else least(lit(65535L),
      ((c.cast("double") - mn.toDouble) / (mx - mn).toDouble * 65535.0).cast("long"))

  /** Bit-interleave two 16-bit ranks into one 32-bit Z-value (Morton
    * order) — plain shift/and/or column arithmetic, fully codegen'd.
    */
  private def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(a.bitwiseAND(lit(1L << i)), i + 1)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
    }.reduce(_ bitwiseOR _)

  /** Z-order (Morton-curve) clustering of events on (ts, user_id): rank
    * both dimensions to 16 bits, interleave, range-partition and sort on
    * the Z-value, then drop it — the written files cluster BOTH dimensions
    * at once, so parquet min/max stats stay tight on ts AND user_id per
    * file and a scan with a predicate on either (or both) skips most row
    * groups. Day-partitioning (writeEventsPartitioned) serves time-only
    * predicates; this is the layout for the two-dimensional access pattern
    * ("this user, this week") where sorting by one key destroys the
    * other's locality. The bounds pass is one 1-row aggregate — a
    * write-time layout cost, not a query path.
    */
  def writeEventsZOrdered(spark: SparkSession, sfDir: String, out: String, files: Int = 16): Unit = {
    val ev = Tables.events(spark, sfDir)
    val b = ev.agg(
      min(col("ts").cast("long")), max(col("ts").cast("long")),
      min(col("user_id")), max(col("user_id"))).collect()(0)
    val z = interleave16(
      rank16(col("ts").cast("long"), b.getLong(0), b.getLong(1)),
      rank16(col("user_id"), b.getLong(2), b.getLong(3)))
    ev.withColumn("zval", z)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  /** Bucketed fact/dim layout: hash-bucket (and sort) both join sides on
    * the join key at WRITE time, so every later join/aggregation on that
    * key reads co-located, pre-sorted buckets and plans with ZERO exchanges
    * — at 100 TB this converts the nightly re-shuffle of the biggest join
    * into a one-time layout cost. Bucket counts must match on both sides
    * (Spark pairs bucket i with bucket i).
    */
  def writeOrdersCustomerBucketed(spark: SparkSession, sfDir: String, buckets: Int = 16): Unit = {
    // idempotent: drop catalog entries AND any orphaned location left by a
    // previous session (saveAsTable refuses to reuse a stale directory)
    Seq("orders_bucketed", "customer_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    Tables.orders(spark, sfDir).write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, sfDir).write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
  }

  /** The canonical consumer: per-customer order rollup joined to the dim,
    * entirely shuffle-free on the bucketed layout.
    */
  def bucketedOrderRollup(spark: SparkSession): DataFrame =
    spark.table("orders_bucketed")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total"))
      .join(spark.table("customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total"))
}
