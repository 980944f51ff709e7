package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact.acc

/** Lake data-quality operators: statistical anomaly flags and declarative
  * expectation audits — the gates a production pipeline runs before
  * promoting a batch.
  */
object QualityOps {

  /** THE per-channel (n, mean, std) decimal-carrier stats chain —
    * single-sourced for q79/q112/q112b so the σ arithmetic (and any fix
    * to it) cannot drift between the three operators. σ may read NaN
    * when carrier rounding drives the variance a hair negative
    * (E[x²] − E[x]² on a sub-resolution-jitter channel) — consumers gate
    * that case explicitly. */
  private def channelStats(e: DataFrame): DataFrame =
    e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(acc(col("value"))).cast("double").as("sx"),
      sum(acc(col("value") * col("value"))).cast("double").as("sx2"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("std", sqrt(col("sx2") / col("n") - col("mean") * col("mean")))

  /** q79 — 3-sigma anomaly detection per sensor type: events whose value
    * sits more than three standard deviations from their type's mean.
    *
    * Shape: one pass computes per-type (n, Σx, Σx²) through the
    * exact-decimal carrier (bit-stable under any partitioning), the tiny
    * stats table broadcasts back, and the flag is a per-row predicate —
    * cost is two scans of events and nothing else at any scale. σ uses the
    * population variance E[x²] − E[x]²; sqrt and the z-score are fixed
    * IEEE chains, so the oracle reproduces them bit-exactly.
    */
  def anomalies(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.join(broadcast(channelStats(e)), Seq("event_type"))
      .filter(abs(col("value") - col("mean")) > lit(3.0) * col("std"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("mean")) / col("std")).as("zscore"))
      .orderBy("event_id")
  }

  /** q112 — sliding two-sample LEVEL-SHIFT scan per sensor channel: at
    * each event (ordered by ts, event_id within its type), compare the
    * mean of the `w` values strictly BEFORE against the mean of the `w`
    * values FROM HERE, and flag positions where the standardized shift
    * |mean_after − mean_before| / (σ·√(2/w)) clears `thresh` — the
    * two-sample z-statistic under the channel's global σ. This is the
    * question q79's point-outlier gate cannot answer: a sensor that
    * RECALIBRATES (every value moves 2σ but each value is individually
    * plausible) trips no 3-sigma flag, while the window means separate
    * immediately — the classic mean-shift change-point scan (Page's
    * CUSUM heritage; see Truong, Oudre & Vayatis, "Selective review of
    * offline change point detection methods", Signal Processing 2020).
    * Only FULL windows are eligible (both counts = w), so series edges
    * never emit half-window artifacts.
    *
    * Shape: ONE shuffle — the per-type window sort (the q07 genus) —
    * with both window means as frame aggregates over the same sort
    * (Spark evaluates the two ROWS frames in one WindowExec pass); σ is
    * the q79 decimal-carrier stats table broadcast back. Window sums
    * ride the exact DECIMAL carrier with ONE final double division per
    * mean, σ and the z-chain are the q79 fixed IEEE chain — oracle
    * bit-exact. At 100 TB the per-type partitions are the scaling unit:
    * a production run windows within (type, day) shards exactly like the
    * other event-series operators; the gate form partitions by type.
    */
  def levelShift(s: SparkSession, d: String, w: Int = 20,
      thresh: Double = 3.0): DataFrame =
    levelShiftOf(Tables.events(s, d), w, thresh)

  /** The scan core over an arbitrary (event_id, event_type, ts, value)
    * frame — seam for the spec's crafted step series. */
  private[graft] def levelShiftOf(e: DataFrame, w: Int, thresh: Double): DataFrame = {
    val stats = channelStats(e).select("event_type", "std")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val before = ord.rowsBetween(-w, -1)
    val after = ord.rowsBetween(0, w - 1)
    e.withColumn("n_before", count(lit(1)).over(before))
      .withColumn("n_after", count(lit(1)).over(after))
      .withColumn("mean_before", sum(acc(col("value"))).over(before).cast("double") / col("n_before"))
      .withColumn("mean_after", sum(acc(col("value"))).over(after).cast("double") / col("n_after"))
      .filter(col("n_before") === w && col("n_after") === w)
      .join(broadcast(stats), Seq("event_type"))
      // σ = 0 (a constant channel) would read 0/0 = NaN, which BOTH
      // engines order above any threshold — gate it out explicitly: a
      // channel that never varies has no level to shift. σ itself can
      // BE NaN (carrier rounding driving the variance a hair negative
      // on a sub-resolution-jitter channel), and NaN > 0.0 is TRUE in
      // both engines' orderings — gate it by name or every full-window
      // row of such a channel would alarm with a NaN z
      .filter(col("std") > 0.0 && !isnan(col("std")))
      .withColumn("shift_z",
        (col("mean_after") - col("mean_before")) / (col("std") * sqrt(lit(2.0) / lit(w.toDouble))))
      .filter(abs(col("shift_z")) > thresh)
      .select(col("event_id"), col("event_type"), col("mean_before"),
        col("mean_after"), col("shift_z"))
      .orderBy("event_id")
  }

  /** q112b — [[levelShift]]'s SCALE PATH: the identical scan (spec- and
    * oracle-pinned bit-equal) with the per-channel window sort replaced
    * by bounded-chunk sliding passes, because the window form's
    * parallelism is the CHANNEL COUNT — five event types means five
    * tasks no matter how many executors, the one shape in the event
    * family that would not survive a 1000× single-channel series.
    *
    * Three bounded steps, no per-channel sort anywhere:
    *   1. dense global row index per channel WITHOUT a global sort:
    *      count rows per (type, time bucket), prefix-sum the bounded
    *      bucket table driver-side (channels × buckets rows — the q73
    *      stats-collect genus), then one hash-shuffle by (type, bucket)
    *      assigns `r = bucketOffset + local position` inside a sorted
    *      mapPartitions pass;
    *   2. rows land in their OWNER chunk c = r / chunk and REPLICATE to
    *      the neighbor that needs them as window context (top w rows of
    *      each chunk to c+1, bottom w to c−1 — each row copies at most
    *      once, so the shuffle is ≤ 2× the input and each task holds ≤
    *      chunk + 2w rows);
    *   3. per chunk, EXACT decimal prefix sums (java BigDecimal at the
    *      carrier's scale-6 HALF_UP — a prefix DIFFERENCE is the same
    *      decimal value the window frame's sum aggregate produces, so
    *      doubles match bit-for-bit) emit each OWNED row's verdict
    *      through the identical IEEE z-chain.
    *
    * Parallelism becomes rows/chunk instead of channels. The time
    * buckets only need to be ORDERED and bounded (a channel recorded
    * entirely inside one bucket degrades step 1 to that bucket's size —
    * pick `bucketNs` below the recording cadence).
    */
  def levelShiftSharded(s: SparkSession, d: String, w: Int = 20,
      thresh: Double = 3.0, chunk: Int = 1 << 16,
      bucketNs: Long = 86400L * 1000L * 1000L * 1000L): DataFrame =
    levelShiftShardedOf(s, Tables.events(s, d), w, thresh, chunk, bucketNs)

  private[graft] def levelShiftShardedOf(s: SparkSession, e: DataFrame, w: Int,
      thresh: Double, chunk: Int, bucketNs: Long): DataFrame = {
    require(chunk >= w, s"chunk $chunk must be >= window $w (single-neighbor context)")
    import s.implicits._
    val ev = e.select(col("event_id").cast("long"), col("event_type"),
      col("ts").cast("long"), col("value").cast("double"))

    // channel σ — THE shared stats chain, collected (bounded: one row
    // per channel); NaN σ drops in the kernel exactly like the window
    // form's isnan gate (Scala's !(NaN > 0.0))
    val stats = channelStats(ev)
      .select("event_type", "std").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bcStd = s.sparkContext.broadcast(stats)

    // ---- step 1: dense per-channel row index from bucket offsets ----
    // INTEGER bucket division: Long/Long `/` in Spark is double
    // division, and at epoch-nanosecond magnitudes (~1.7e18, double ulp
    // 256 ns) a row within an ulp of a bucket boundary would round into
    // the wrong bucket and permute the dense index off the (ts,
    // event_id) order. `div` is exact at any magnitude (ts ≥ 0 here, so
    // truncation IS floor).
    val bucketed = ev.withColumn("tb", call_function("div", col("ts"), lit(bucketNs)))
    val counts = bucketed.groupBy("event_type", "tb").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
    val offsets = counts.sortBy(_._1).foldLeft(
      (Map.empty[(String, Long), Long], Map.empty[String, Long])) {
      case ((offs, running), (key @ (t, _), n)) =>
        val start = running.getOrElse(t, 0L)
        (offs + (key -> start), running + (t -> (start + n)))
    }._1
    val bcOff = s.sparkContext.broadcast(offsets)
    val indexed = bucketed
      .repartition(col("event_type"), col("tb"))
      .sortWithinPartitions("event_type", "tb", "ts", "event_id")
      .select(col("event_type"), col("tb"), col("event_id"), col("value"))
      .as[(String, Long, Long, Double)]
      .mapPartitions { it =>
        val offs = bcOff.value
        var curKey: (String, Long) = null
        var local = 0L
        it.map { case (t, tb, id, v) =>
          val key = (t, tb)
          if (key != curKey) { curKey = key; local = 0L }
          val r = offs(key) + local
          local += 1L
          (t, r, id, v)
        }
      }

    // ---- step 2: owner chunk + neighbor context replication ----
    val routed = indexed.flatMap { case (t, r, id, v) =>
      val c = r / chunk
      val pos = r % chunk
      val owner = (t, c, r, id, v, true)
      val up = if (pos >= chunk - w) Some((t, c + 1, r, id, v, false)) else None
      val down = if (pos < w && c > 0) Some((t, c - 1, r, id, v, false)) else None
      Iterator(owner) ++ up.iterator ++ down.iterator
    }.toDF("event_type", "c", "r", "event_id", "value", "owned")

    // ---- step 3: exact decimal prefix sums per chunk ----
    val thr = thresh
    val ww = w
    routed
      .repartition(col("event_type"), col("c"))
      .sortWithinPartitions("event_type", "c", "r")
      .as[(String, Long, Long, Long, Double, Boolean)]
      .mapPartitions { it =>
        val stds = bcStd.value
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Boolean)]
        var curKey: (String, Long) = null
        def flush(key: (String, Long)): Iterator[(Long, String, Double, Double, Double)] = {
          if (key == null || buf.isEmpty) return Iterator.empty
          val (t, _) = key
          val std = stds.getOrElse(t, 0.0)
          if (!(std > 0.0)) { buf.clear(); return Iterator.empty }
          val n = buf.length
          // exact scale-6 prefix sums (the decimal carrier's HALF_UP)
          val prefix = new Array[java.math.BigDecimal](n + 1)
          prefix(0) = java.math.BigDecimal.ZERO
          var i = 0
          while (i < n) {
            prefix(i + 1) = prefix(i).add(java.math.BigDecimal
              .valueOf(buf(i)._3).setScale(6, java.math.RoundingMode.HALF_UP))
            i += 1
          }
          val base = buf.head._1 // first global r in the buffer (contiguous)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double, Double, Double)]
          i = 0
          while (i < n) {
            val (r, id, _, owned) = buf(i)
            // full windows: w context rows on each side must EXIST in
            // the buffer ([base, base+n)) — edges of the series never
            // qualify, edges of the chunk are covered by replication
            if (owned && r - ww >= base && r + ww - 1 <= base + n - 1) {
              val lo = (r - ww - base).toInt
              val mid = (r - base).toInt
              val mb = prefix(mid).subtract(prefix(lo)).doubleValue() / ww
              val ma = prefix(mid + ww).subtract(prefix(mid)).doubleValue() / ww
              val z = (ma - mb) / (std * math.sqrt(2.0 / ww))
              if (math.abs(z) > thr) out += ((id, t, mb, ma, z))
            }
            i += 1
          }
          buf.clear()
          out.iterator
        }
        val tail = it.flatMap { case (t, c, r, id, v, owned) =>
          val key = (t, c)
          val emitted = if (key != curKey) flush(curKey) else Iterator.empty
          curKey = key
          buf += ((r, id, v, owned))
          emitted
        }
        tail ++ flushAtEnd(() => flush(curKey))
      }
      .toDF("event_id", "event_type", "mean_before", "mean_after", "shift_z")
      .orderBy("event_id")
  }

  /** Lazily evaluate the final group flush AFTER the upstream iterator
    * drains (an eagerly-evaluated `++ flush(...)` would run before any
    * rows arrived). */
  private def flushAtEnd[T](f: () => Iterator[T]): Iterator[T] =
    new Iterator[T] {
      private var inner: Iterator[T] = null
      private def it: Iterator[T] = { if (inner == null) inner = f(); inner }
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }

  /** A declarative expectation: a name and a row-level violation
    * predicate. */
  final case class Expectation(name: String, violated: Column)

  /** The default expectation suite for the lineitem table — the kinds of
    * constraints a warehouse gate enforces (domain ranges, non-null,
    * cross-field consistency). */
  def lineitemExpectations: Seq[Expectation] = Seq(
    Expectation("quantity_in_range",
      col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
    Expectation("discount_in_range",
      col("l_discount") < 0.0 || col("l_discount") > 0.1),
    Expectation("price_positive", col("l_extendedprice") <= 0.0),
    Expectation("shipdate_not_null", col("l_shipdate").isNull),
    Expectation("returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
    Expectation("tax_in_range", col("l_tax") < 0.0 || col("l_tax") > 0.2),
    // deliberately tight: fires on clean data too, proving the counting
    // path end-to-end (an audit where every check trivially passes tests
    // nothing)
    Expectation("quantity_not_extreme", col("l_quantity") > 45.0))

  /** q80 — expectation audit in ONE scan: every check is a conditional
    * count inside a single aggregation (map-side partials, no shuffle
    * beyond one row per check), emitted long-form with a pass flag — the
    * Deequ-style quality gate shape. A null predicate input counts as a
    * violation only if the check says so (predicates are explicit about
    * null handling), never silently.
    */
  def expectationAudit(s: SparkSession, d: String,
                       checks: Seq[Expectation] = lineitemExpectations): DataFrame = {
    val li = Tables.lineitem(s, d)
    // positional aliases + explode(array(struct(lit(name), col)))) — check
    // names are DATA, never spliced into SQL text or column identifiers,
    // so any name (quotes, spaces, duplicates) is fine
    val aggs = count(lit(1)).as("n_rows") +:
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violated, 1L).otherwise(0L)).as(s"v_$i") }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val pairs = array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"v_$i").as("n_violations")) }: _*)
    wide
      .select(col("n_rows"), explode(pairs).as("e"))
      .select(
        col("e.check_name").as("check_name"), col("n_rows"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).as("pass"))
      .orderBy("check_name")
  }
}
