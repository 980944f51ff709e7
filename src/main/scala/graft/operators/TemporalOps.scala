package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal-alignment operators over the sensor stream: linear-interpolation
  * alignment (the lidar/odometry-to-camera-timestamp resample every fusion
  * pipeline needs — q26's as-of join picks the nearest earlier sample, this
  * interpolates BETWEEN the bracketing samples) and the interval-overlap
  * join (which Spark would otherwise plan as a nested-loop theta join).
  *
  * `ts` is epoch-nanos (long) end to end, like the rest of the domain ops.
  */
object TemporalOps {

  private val nsPerUs = 1000L

  /** q71 — interpolation alignment: for every 'view' frame, the sensor
    * reading ('error' stream, same camera) linearly interpolated at the
    * frame's timestamp from the bracketing measurements.
    *
    * Shape: union both streams tagged, ONE shuffle on user_id, then two
    * in-partition window passes — a forward scan carrying the last
    * measurement at-or-before each row and a backward scan carrying the
    * first at-or-after. No range join, no per-pair work: linear in the
    * stream, state bounded per camera, so the plan is unchanged at 100 TB.
    * (A naive implementation joins every frame against every measurement
    * in a time band and re-sorts per pair.)
    *
    * Tie rules (total order, so both engines pick the same row): at equal
    * ts a measurement brackets the frame on both sides; among equal-ts
    * measurements the forward scan takes the largest event_id, the
    * backward scan the smallest. Boundary frames (before the first / after
    * the last measurement) take the single available neighbor; cameras
    * with no measurements yield null.
    *
    * The lerp is a fixed chain of IEEE double ops on int64 deltas —
    * bit-identical in any engine, no float time anywhere.
    */
  def interpAlign(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    // Microsecond resolution on purpose: the DuckDB oracle's TIMESTAMP is
    // µs-precision, so interpolating on raw nanos would disagree in the
    // ~1e-10 tail of the lerp fraction. µs is already finer than any real
    // camera/IMU clock alignment needs.
    val tUs = call_function("div", col("ts"), lit(nsPerUs)).as("t_us")
    // kind 0 = measurement (error), 1 = frame (view): kind breaks ts ties
    // so a same-ts measurement sorts before the frame on the forward scan.
    val meas = e.filter(col("event_type") === "error")
      .select(col("user_id"), tUs, col("event_id"), col("value"), lit(0).as("kind"))
    val frames = e.filter(col("event_type") === "view")
      .select(col("user_id"), tUs, col("event_id"), lit(null).cast("double").as("value"),
        lit(1).as("kind"))

    val fwd = Window.partitionBy("user_id")
      .orderBy(col("t_us").asc, col("kind").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // backward scan: descending ts; kind stays ascending so an equal-ts
    // measurement is still in the frame's preceding set.
    val bwd = Window.partitionBy("user_id")
      .orderBy(col("t_us").desc, col("kind").asc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def measOnly(c: Column): Column = when(col("kind") === 0, c)

    val lerp = {
      val span = (col("next_ts") - col("prev_ts")).cast("double")
      val frac = (col("t_us") - col("prev_ts")).cast("double") / span
      when(col("prev_ts").isNull, col("next_v"))
        .when(col("next_ts").isNull, col("prev_v"))
        .when(col("next_ts") === col("prev_ts"), col("prev_v"))
        .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) * frac)
    }

    meas.unionByName(frames)
      .withColumn("prev_ts", last(measOnly(col("t_us")), ignoreNulls = true).over(fwd))
      .withColumn("prev_id", last(measOnly(col("event_id")), ignoreNulls = true).over(fwd))
      .withColumn("prev_v", last(measOnly(col("value")), ignoreNulls = true).over(fwd))
      .withColumn("next_ts", last(measOnly(col("t_us")), ignoreNulls = true).over(bwd))
      .withColumn("next_id", last(measOnly(col("event_id")), ignoreNulls = true).over(bwd))
      .withColumn("next_v", last(measOnly(col("value")), ignoreNulls = true).over(bwd))
      .filter(col("kind") === 1)
      .select(
        col("event_id").as("view_id"),
        col("user_id"),
        col("t_us"),
        col("prev_id"), col("next_id"),
        lerp.as("value_interp"))
      .orderBy("view_id")
  }

  private val gapNs    = 3600L * 1000000000L  // 1 h activity gap closes a session
  private val halfWinNs = 600L * 1000000000L  // error burst window: ts ± 10 min
  private val binNs    = 1200L * 1000000000L  // bucket = full window span

  /** q72 — interval-overlap join: per-camera activity sessions (non-error
    * events, 1 h gap) joined against that camera's error-burst windows
    * (ts ± 10 min) on interval overlap, counting distinct bursts per
    * session.
    *
    * Spark has no range-join strategy, so the naive `ON s.start <= w.end
    * AND w.start <= s.end` plans as a nested-loop join — sessions x windows
    * per camera, quadratic in recording length. Instead both interval sets
    * are exploded onto a fixed time-bin grid (bin = the full window span,
    * so a window covers at most 2 bins) and equi-joined on (user_id, bin) —
    * a plain shuffle-hash join whose cost is linear in intervals x
    * bins-per-interval, with the exact overlap predicate re-checked on the
    * matched pairs and duplicates collapsed by the distinct-count
    * aggregation. The DuckDB oracle runs the plain theta join, proving the
    * binning lossless (same adjudication pattern as q41c's prefix filter).
    */
  /** Shared derivation for q72/q72b: per-camera activity sessions (1 h
    * gap) and per-camera error-burst windows (ts ± 10 min). */
  private def sessionsAndWindows(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = e.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val wins = e.filter(col("event_type") === "error")
      .select(
        col("user_id"), col("event_id").as("wid"),
        (col("ts") - halfWinNs).as("w_start"), (col("ts") + halfWinNs).as("w_end"))
    (sessions, wins)
  }

  def overlapJoin(s: SparkSession, d: String): DataFrame = {
    val (sessions, wins) = sessionsAndWindows(s, d)

    def bins(lo: Column, hi: Column): Column =
      explode(sequence(
        call_function("div", lo, lit(binNs)), call_function("div", hi, lit(binNs))))

    val sBinned = sessions.withColumn("bin", bins(col("s_start"), col("s_end")))
    val wBinned = wins.withColumn("bin", bins(col("w_start"), col("w_end")))

    sBinned.join(wBinned, Seq("user_id", "bin"))
      .filter(col("s_start") <= col("w_end") && col("w_start") <= col("s_end"))
      .groupBy(col("user_id"), col("session_seq"),
        call_function("div", col("s_start"), lit(nsPerUs)).as("start_us"))
      .agg(
        countDistinct(col("wid")).as("n_windows"),
        min(col("wid")).as("first_wid"))
      .orderBy("user_id", "session_seq")
  }

  /** q72b — the SAME overlap query as q72, but written the way a user
    * would: a plain theta join `s.start <= w.end AND w.start <= s.end`,
    * relying on [[graft.plans.RangeJoinRule]] (enabled here via
    * `spark.graft.rangeJoin.binWidth`) to rewrite it into the binned
    * equi-join automatically. Shares q72's oracle — parity proves the
    * optimizer rewrite end-to-end, the same adjudication q41c uses for the
    * prefix filter. RangeJoinRuleSpec additionally pins plan shape and
    * row-level multiplicity.
    */
  def overlapJoinViaRule(s: SparkSession, d: String): DataFrame = {
    val (sessions, winsRaw) = sessionsAndWindows(s, d)
    val wins = winsRaw.withColumnRenamed("user_id", "w_user")

    val theta = sessions.join(wins,
        sessions("user_id") === wins("w_user") &&
        sessions("s_start") <= wins("w_end") && wins("w_start") <= sessions("s_end"))
      .groupBy(col("user_id"), col("session_seq"),
        call_function("div", col("s_start"), lit(nsPerUs)).as("start_us"))
      .agg(
        countDistinct(col("wid")).as("n_windows"),
        min(col("wid")).as("first_wid"))
      .orderBy("user_id", "session_seq")

    // Apply the rewrite EAGERLY to this one plan via the rule's explicit-
    // width entry point — no session conf is touched, so concurrent
    // sessions/threads can neither lose the rewrite nor leak it onto
    // later overlap-shaped joins.
    org.apache.spark.sql.graft.Bridge.ofRows(
      s, graft.plans.RangeJoinRule.rewrite(theta.queryExecution.analyzed, binNs))
  }

  /** q78 — event-type transition matrix: bigram counts of consecutive
    * event types within a camera's stream (lag over one user_id shuffle),
    * with integer-exact row-normalized percentages — the Markov-chain
    * summary of sensor/user behavior ("what follows an error?"). The
    * matrix is |types|² rows regardless of input size.
    */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bigrams = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = Window.partitionBy("from_type")
    bigrams
      .withColumn("from_total", sum(col("n")).over(fromTotals))
      .select(
        col("from_type"), col("to_type"), col("n"),
        call_function("div", col("n") * 10000L, col("from_total")).as("share_bp"))
      .orderBy("from_type", "to_type")
  }

  /** q77 — cohort retention: users bucketed by first-seen week (the
    * cohort), counted as retained in each subsequent week they are active
    * — the standard retention matrix, in long form (cohort_week,
    * active_week, n_users, retention_pct).
    *
    * Shape: one shuffle on user_id; the cohort label is a min-over-window
    * on that partitioning (no user-level self-join), the distinct
    * (cohort, week, user) pass and the final count ride the same columns.
    * retention_pct is integer-scaled (pct of the cohort's week-0 size,
    * floor) so the output is engine-exact.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val weekNs = 7L * 86400L * 1000000000L
    val w = Window.partitionBy("user_id")
    val weeks = Tables.events(s, d)
      .select(col("user_id"), call_function("div", col("ts"), lit(weekNs)).as("week"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("cohort_week"), col("week"), col("user_id"))
      .distinct()
    val counts = weeks.groupBy("cohort_week", "week")
      .agg(countDistinct(col("user_id")).as("n_users"))
    val base = counts.filter(col("week") === col("cohort_week"))
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    counts.join(base, Seq("cohort_week"))
      .select(
        col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"),
        col("n_users"),
        col("cohort_size"),
        call_function("div", col("n_users") * 100L, col("cohort_size")).as("retention_pct"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** q76 — rolling time-series features: the per-sensor feature block a
    * forecasting/anomaly trainer consumes — trailing 10-row exact-decimal
    * mean, trailing 3-row min/max, and the lag-1 delta, all on one
    * user_id shuffle (every frame rides the same window sort). The rolling
    * mean goes through the exact-decimal carrier: engines may slide their
    * window sum differently (re-add vs evict), decimal math makes any
    * order bit-identical.
    */
  def rollingFeatures(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val w10 = base.rowsBetween(-9, Window.currentRow)
    val w3 = base.rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .select(
        col("event_id"), col("user_id"),
        (sum(graft.functions.Exact.acc(col("value"))).over(w10).cast("double") /
          count(lit(1)).over(w10)).as("mean_10"),
        min(col("value")).over(w3).as("min_3"),
        max(col("value")).over(w3).as("max_3"),
        (col("value") - lag(col("value"), 1).over(base)).as("delta_1"))
      .orderBy("event_id")
  }

  /** q75 — SCD2 reconstruction: collapse the per-camera event stream into
    * type-2 slowly-changing-dimension intervals — one row per state run
    * (consecutive same event_type), with [valid_from, valid_to) bounds,
    * a version number, and an is_current flag. The lake-side history table
    * every downstream "state as of T" join consumes; the reference's
    * DynamoDB monitor table (q27) keeps only the latest row, this keeps
    * the full history.
    *
    * Shape: one shuffle on user_id; the change-point filter (lag) and the
    * interval close (lead) are two in-partition window passes over it —
    * no self-join, no state larger than one row per camera. Exact int64
    * time, string states; nothing float anywhere.
    */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes
      .withColumn("valid_to_ns", lead(col("ts"), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select(
        col("user_id"),
        col("version"),
        col("event_type").as("state"),
        call_function("div", col("ts"), lit(nsPerUs)).as("valid_from_us"),
        call_function("div", col("valid_to_ns"), lit(nsPerUs)).as("valid_to_us"),
        col("valid_to_ns").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** The sensor-sync CORE shared by q111 and the lake audit: for every
    * reference row ("rig", "t", unique "rid"), the SIGNED gap to the
    * nearest sensor timestamp on the same rig — positive when the nearest
    * sensor sample precedes the frame, negative when it follows, NULL
    * when the rig has no sensor samples at all. Nearest-EITHER-direction,
    * tie → the earlier sample (the deterministic rule both engines share).
    *
    * Shape: the q71 scan — union both streams tagged, ONE shuffle on rig,
    * a forward window pass carrying the last sensor ts at-or-before each
    * row and a backward pass carrying the first at-or-after. No range
    * join, no per-pair work: linear in the stream, state bounded per rig,
    * unchanged at 100 TB.
    */
  private def nearestGapOf(ref: DataFrame, sensor: DataFrame): DataFrame = {
    // kind 0 = sensor, 1 = reference frame: kind breaks ts ties so a
    // same-ts sensor sample is visible to BOTH scans (gap 0). Only
    // TIMESTAMPS are read from the sensor side, so equal-key window
    // order is irrelevant — every order yields the same prev/next ts.
    val s0 = sensor.select(col("rig"), col("t"), lit(0).as("kind"))
    val f1 = ref.select(col("rig"), col("t"), lit(1).as("kind"))
    val fwd = Window.partitionBy("rig")
      .orderBy(col("t").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy("rig")
      .orderBy(col("t").desc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def sensorOnly(c: Column): Column = when(col("kind") === 0, c)
    val prevGap = col("t") - col("prev_ts")   // ≥ 0
    val nextGap = col("next_ts") - col("t")   // ≥ 0
    s0.unionByName(f1)
      .withColumn("prev_ts", last(sensorOnly(col("t")), ignoreNulls = true).over(fwd))
      .withColumn("next_ts", last(sensorOnly(col("t")), ignoreNulls = true).over(bwd))
      .filter(col("kind") === 1)
      .select(col("rig"), col("t"),
        when(col("prev_ts").isNull && col("next_ts").isNull, lit(null).cast("long"))
          .when(col("next_ts").isNull, prevGap)
          .when(col("prev_ts").isNull, -nextGap)
          .when(prevGap <= nextGap, prevGap)
          .otherwise(-nextGap).as("gap"))
  }

  /** [[nearestGapOf]] rolled up per (rig, bucket): frame count, unmatched
    * count, worst absolute gap, and the decimal-exact mean SIGNED gap —
    * the per-window clock-skew estimate (a consistent nonzero mean is a
    * clock offset between the two sensors; a blowing-up max is dropped
    * samples). Output is bounded by rigs × buckets. */
  private def syncRollupOf(gaps: DataFrame, bucketT: Long): DataFrame =
    gaps
      .groupBy(col("rig"), call_function("div", col("t"), lit(bucketT)).as("bucket"))
      .agg(
        count(lit(1)).as("n_frames"),
        (count(lit(1)) - count(col("gap"))).as("n_unmatched"),
        max(abs(col("gap"))).as("max_abs_gap"),
        // gaps are exact int64, so the plain integer SUM is already exact
        // and order-insensitive — and it must NOT ride the decimal
        // carrier: at ~1e12 µs gaps the scale-6 unscaled sum exceeds
        // 2^53, where DuckDB's int128-decimal→double conversion
        // double-rounds (unscaled→double, then ÷10⁶) while Spark's
        // BigDecimal converts once — a real observed 1e-4 µs divergence.
        // int64→double is a single correctly-rounded conversion in both.
        (sum(col("gap")).cast("double") / count(col("gap"))).as("mean_gap"))

  /** q111 — sensor-sync audit: cross-modal time-alignment QA, the first
    * question an AV data consumer asks of a multi-sensor lake ("are the
    * camera and the lidar/mic clocks actually aligned, and did either
    * drop samples?"). Per (rig, hour window): how many reference frames,
    * how many had NO second-modality sample at all, the worst |frame ts −
    * nearest sensor ts| in µs, and the mean SIGNED gap — the clock-skew
    * gauge. On the gate lake, 'view' events are the camera frames and
    * 'click' events the second sensor, per camera (user_id = rig); the
    * lake twin over real bag tables is [[sensorSyncLakeOf]].
    *
    * Oracled: DuckDB computes the same nearest-either-direction gap with
    * two ASOF joins (backward + forward); Spark computes it with the q71
    * single-shuffle two-scan shape — parity proves the scan equivalent to
    * the ASOF pair. µs resolution end to end (the q26/q71 convention);
    * the mean rides the exact decimal carrier.
    */
  def sensorSync(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def tUs = call_function("div", col("ts"), lit(nsPerUs)).as("t")
    val frames = e.filter(col("event_type") === "view")
      .select(col("user_id").as("rig"), tUs)
    val sensor = e.filter(col("event_type") === "click")
      .select(col("user_id").as("rig"), tUs)
    syncRollupOf(nearestGapOf(frames, sensor), 3600L * 1000000L)
      .select(col("rig").as("user_id"), col("bucket").as("hour_bucket"),
        col("n_frames"), col("n_unmatched"),
        col("max_abs_gap").as("max_abs_gap_us"),
        col("mean_gap").as("mean_gap_us"))
      .orderBy("user_id", "hour_bucket")
  }

  /** The LAKE form of the q111 audit: reference frames (bag, time_ns)
    * against a second modality's (bag, time_ns) — images vs clips,
    * images vs clouds — rolled up per (bag, window of `bucketNs`).
    * UNORDERED (the cloudStats convention: a QA pass feeds filters and
    * alarms, not a report). */
  def sensorSyncLakeOf(frames: DataFrame, sensor: DataFrame,
      bucketNs: Long = 60L * 1000000000L): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be > 0; got $bucketNs")
    val ref = frames.select(col("bag").as("rig"), col("time_ns").as("t"))
    val sen = sensor.select(col("bag").as("rig"), col("time_ns").as("t"))
    val frameRollup = syncRollupOf(nearestGapOf(ref, sen), bucketNs)
    // sensor-activity buckets with NO reference frames (a review
    // finding): the audit is frame-centric, so a TOTAL camera outage —
    // the most severe sensor drop — previously landed zero rows and
    // monitoring saw silence. Those buckets now land n_frames = 0 rows
    // (gaps NULL: no reference to measure from), so a dead camera shows
    // up in its own arriving batch like every other failure.
    val sensorOnly = sen
      .groupBy(col("rig"), call_function("div", col("t"), lit(bucketNs)).as("bucket"))
      .agg(count(lit(1)).as("n_sensor"))
      .join(frameRollup.select("rig", "bucket"), Seq("rig", "bucket"), "left_anti")
      .select(col("rig"), col("bucket"),
        lit(0L).as("n_frames"), lit(0L).as("n_unmatched"),
        lit(null).cast("long").as("max_abs_gap"),
        lit(null).cast("double").as("mean_gap"))
    frameRollup.unionByName(sensorOnly)
      .select(col("rig").as("bag"), col("bucket"), col("n_frames"),
        col("n_unmatched"), col("max_abs_gap").as("max_abs_gap_ns"),
        col("mean_gap").as("mean_gap_ns"))
  }
}
