package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming equivalents of the reference's queue-driven stages
  * (SURVEY.md §2 `streaming`): the SQS->Fargate ingest loop becomes
  * `readStream` -> transforms -> `writeStream`, and the DynamoDB monitor
  * table becomes a stateful per-key aggregation.
  *
  * All operators take an untyped streaming DataFrame with the `events`
  * schema (ts as epoch-nanos long), so the same code runs on a file stream,
  * Kafka, or a MemoryStream in tests.
  */
object EventStreams {

  /** Event-time tumbling-window counts per event type with a watermark —
    * the per-topic ingest-rate dashboard. Late data beyond the watermark is
    * dropped, which bounds state at any scale.
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Windowed trending top-k: per event-time window and type, the k
    * highest-value events — the custom `graft_topk` imperative aggregate
    * running INSIDE Structured Streaming, where its bounded k-entry state
    * matters twice: the streaming aggregation state store holds k entries
    * per (window, type) instead of a full sorted history, and late
    * arrivals merge into the heap exactly like any partial. Emits on
    * watermark close (append mode).
    */
  def trendingTopK(events: DataFrame, k: Int = 2, windowDur: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur), col("event_type"))
      .agg(call_function("graft_topk",
        col("value"), col("event_id"), col("user_id"), lit(k)).as("top"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("top"))

  final case class Ev(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  final case class SessionUpdate(user_id: Long, session_start_ns: Long, session_end_ns: Long, n_events: Int, closed: Boolean)
  final case class SessionState(startNs: Long, endNs: Long, n: Int)

  /** Stateful sessionization with an inactivity gap — the streaming twin of
    * RosbagDomainOps.sessionize (same gap semantics), built on
    * flatMapGroupsWithState. An EVENT-TIME timeout (armed at session end +
    * gap, fired by watermark advance) flushes the open session of a quiet
    * key and removes its state — so every recording's final session is
    * emitted and state stays bounded by active keys, without the busy
    * re-triggering a processing-time timeout would cause.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Ev],
      gapNs: Long = 21600L * 1000000000L,
      watermarkDelay: String = "2 hours"): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      .withWatermark("event_time", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed session end + gap: flush as final
            val st = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, st.startNs, st.endNs, st.n, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              cur match {
                case Some(st) if e.ts < st.startNs - gapNs =>
                  // a late event more than a gap BEFORE the open session is
                  // its own (already-closed) session, matching the batch
                  // semantics; never merged, never drags startNs back
                  out += SessionUpdate(userId, e.ts, e.ts, 1, closed = true)
                case Some(st) if e.ts - st.endNs <= gapNs =>
                  // in-window (possibly late) event: extend, never shrink
                  cur = Some(st.copy(startNs = math.min(st.startNs, e.ts),
                    endNs = math.max(st.endNs, e.ts), n = st.n + 1))
                case Some(st) =>
                  out += SessionUpdate(userId, st.startNs, st.endNs, st.n, closed = true)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp((st.endNs + gapNs) / 1000000L) // epoch millis
            }
            out.result().iterator
          }
      }
  }

  final case class ShiftAlarm(event_id: Long, event_type: String,
    mean_before: Double, mean_after: Double, shift_z: Double)
  final case class ShiftState(lastTs: Long, lastId: Long, n: Long,
    sx: Double, sx2: Double, ring: List[(Long, Double)])

  /** Streaming LEVEL-SHIFT guard — the ingest-time twin of the q112 scan
    * (QualityOps.levelShift): per channel, a sliding 2w ring evaluates
    * the center event once its w-1 successors have arrived — mean of the
    * w before vs the w from it, standardized by the channel's RUNNING σ
    * (the expanding-window estimate a stream can actually have; the
    * oracled batch form uses the full-corpus σ — that is the documented
    * divergence, the alarm semantics are identical). State per channel
    * is 2w values + three running scalars — bounded forever.
    *
    * Ordering contract (the sessionizeStream school): each micro-batch
    * sorts its rows (ts, event_id); a cross-batch straggler older than
    * the ring's newest appended row is DROPPED, not spliced — a
    * monitoring gauge must not re-alarm history, and the exact replay
    * lives in the batch form. Alarms gate on n ≥ 4w observations so the
    * running σ has settled.
    */
  def levelShiftStream(spark: SparkSession, events: Dataset[Ev], w: Int = 20,
      thresh: Double = 3.0): Dataset[ShiftAlarm] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ShiftState, ShiftAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (channel: String, rows: Iterator[Ev], state: GroupState[ShiftState]) =>
          var st = state.getOption.getOrElse(ShiftState(Long.MinValue, Long.MinValue, 0L, 0.0, 0.0, Nil))
          val out = Seq.newBuilder[ShiftAlarm]
          rows.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            // straggler older than the newest appended row: dropped (see
            // ordering contract)
            if (e.ts > st.lastTs || (e.ts == st.lastTs && e.event_id > st.lastId)) {
              val ring = (st.ring :+ (e.event_id, e.value)).takeRight(2 * w)
              val n = st.n + 1
              val sx = st.sx + e.value
              val sx2 = st.sx2 + e.value * e.value
              if (ring.length == 2 * w && n >= 4L * w) {
                val mean = sx / n
                val std = math.sqrt(sx2 / n - mean * mean)
                if (std > 0.0) {
                  val (candId, _) = ring(w)
                  val mb = ring.take(w).map(_._2).sum / w
                  val ma = ring.drop(w).map(_._2).sum / w
                  val z = (ma - mb) / (std * math.sqrt(2.0 / w))
                  if (math.abs(z) > thresh) out += ShiftAlarm(candId, channel, mb, ma, z)
                }
              }
              st = ShiftState(e.ts, e.event_id, n, sx, sx2, ring)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming exact dedup — the ingest-time guard of the batch dedup
    * family (DedupOps.exact): drop re-deliveries of the same document/frame
    * key as they arrive. `dropDuplicatesWithinWatermark` keys the state
    * store on the dedup columns and the watermark bounds state retention,
    * so the operator runs forever on an unbounded stream — the
    * at-least-once queue feeding the reference's workers made exactly this
    * guard necessary (its DynamoDB conditional writes); here it is one
    * declarative operator.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours",
      keys: Seq[String] = Seq("user_id", "event_id")): DataFrame =
    events
      // watermark staged in its own column (like every sibling operator):
      // the epoch-nanos long `ts` passes through UNTOUCHED, so the guard
      // composes with the downstream operators that share that contract
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .drop("event_time")

  /** Stream-stream join with watermarks: attribute each 'view' to a 'click'
    * of the same user within the preceding hour. Both sides carry
    * watermarks so the join state is bounded — the streaming twin of the
    * batch as-of join (RosbagDomainOps.asofJoin).
    */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val base = events
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("event_time").as("click_time"))
      .withWatermark("click_time", "2 hours")
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("event_time").as("view_time"))
      .withWatermark("view_time", "2 hours")
    views.join(clicks,
      col("v_user") === col("c_user") &&
        col("view_time") >= col("click_time") &&
        col("view_time") <= col("click_time") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("v_user").as("user_id"), col("click_id"), col("view_time"), col("click_time"))
  }

  /** The reference's monitor table as a streaming aggregation: latest
    * status + counts per worker, updated per micro-batch (complete/update
    * mode sink feeds the dashboard).
    */
  def monitorTable(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        // event_id in the ordering key: same tie-break as the batch
        // monitorStatus (ts desc, event_id desc)
        max(struct(col("ts"), col("event_id"), col("event_type"))).getField("event_type").as("last_status"),
        max(col("ts")).as("last_ts"))
}
