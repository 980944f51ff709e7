package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DedupOps

/** Streaming corpus-ingest guards — the streaming twins of the batch dedup
  * family (SURVEY.md §2 `streaming`): where `DedupOps.incrementalDedup`
  * (q62) triages a finished batch against a finished corpus, these operators
  * triage documents AS THEY ARRIVE against everything already ingested,
  * with state bounded by an event-time TTL.
  */
object CorpusStreams {

  /** A document on the ingest stream: `ts` is epoch-nanos (the same int64
    * time contract as the events table). */
  final case class DocIn(doc_id: Long, ts: Long, text: String)

  /** Per-(doc, band) ingest verdict: `neardup` iff the band bucket was
    * already claimed by a DIFFERENT document; `owner` is the claiming doc.
    * A doc is a near-duplicate when any of its bands reports neardup —
    * the same any-band-agrees rule as the batch LSH (q42/q62).
    */
  final case class BandVerdict(doc_id: Long, band: Long, neardup: Boolean, owner: Long)

  /** Bucket state: the claiming doc plus the latest event time that touched
    * the bucket — kept explicitly because GroupState has no timeout getter,
    * and a late (watermark-admissible) arrival must never SHRINK the
    * expiry below last-touch + TTL. */
  final case class BucketState(owner: Long, lastTouchMs: Long)

  /** THE ownership/TTL state machine both ingest guards fold through —
    * single-sourced so the subtle invariants (rows apply in (ts, id)
    * order; a late watermark-admissible arrival never SHRINKS the
    * expiry; the timeout clamps just past the current watermark so
    * setTimeoutTimestamp cannot throw) cannot drift between the band
    * guard and the fingerprint guard. `oncePerDoc` dedupes verdicts per
    * claiming doc (the winnow guard's per-(doc,fp) contract) while every
    * row still advances last-touch.
    */
  private def claimFold[V](
      rows: Seq[(Long, java.sql.Timestamp)],
      state: GroupState[BucketState],
      ttlMs: Long,
      oncePerDoc: Boolean)(emit: (Long, Boolean, Long) => V): Iterator[V] = {
    if (state.hasTimedOut) {
      // the watermark passed last-touch + TTL: the claim expires and the
      // next arrival starts a fresh ownership
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.sortBy { case (id, ts) => (ts.getTime, id) }
      var cur = state.getOption
      val emitted = scala.collection.mutable.Set.empty[Long]
      val out = sorted.flatMap { case (id, ts) =>
        cur match {
          case Some(st) =>
            // a LATE arrival (ts before lastTouch) must not shrink the
            // expiry — last-touch only ever advances
            cur = Some(st.copy(lastTouchMs = math.max(st.lastTouchMs, ts.getTime)))
            if (!oncePerDoc || emitted.add(id))
              Some(emit(id, st.owner != id, st.owner))
            else None
          case None =>
            cur = Some(BucketState(id, ts.getTime))
            emitted.add(id)
            Some(emit(id, false, id))
        }
      }
      cur.foreach { st =>
        state.update(st)
        // a watermark-admissible arrival can still sit further behind the
        // watermark than the TTL is long (small TTL, generous delay):
        // clamp the expiry just past the current watermark or
        // setTimeoutTimestamp throws and kills the query
        state.setTimeoutTimestamp(math.max(
          st.lastTouchMs + ttlMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Streaming near-dup triage: each document's MinHash band buckets
    * (computed map-side by the same `graft_shingles |> graft_minhash`
    * kernels as the batch path — one code path for both) claim keyed state;
    * a later document landing in a claimed bucket is flagged against the
    * bucket's owner. Re-deliveries of the owner itself are NOT flagged.
    *
    * Scale/state design: state is two longs (owner doc id, last-touch time)
    * per occupied bucket — the minimal LSH ingest index — and each bucket
    * expires via an
    * event-time timeout `bucketTtlMs` past the last document that touched
    * it, so an unbounded stream holds state only for buckets active inside
    * the TTL horizon (the production "near-dup within a retention window"
    * contract; a full-history index would grow without bound by design).
    * Within a micro-batch, rows apply in (ts, doc_id) order, so output is
    * deterministic under replay.
    */
  def neardupStream(
      spark: SparkSession,
      docs: DataFrame,
      watermarkDelay: String = "2 hours",
      bucketTtlMs: Long = 24L * 3600 * 1000): Dataset[BandVerdict] = {
    import spark.implicits._
    val banded = DedupOps.bandRows(
      docs
        .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
        .withWatermark("event_time", watermarkDelay),
      carry = Seq("event_time"))
    banded
      .select(col("doc_id"), col("event_time"), col("band"), col("sig"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey { case (_, _, band, sig) => s"$band:$sig" }
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[BucketState]) =>
          val rs = rows.toSeq
          // every row emits a verdict (band-level granularity); the
          // band value is constant within the group key
          val band = rs.headOption.map(_._3).getOrElse(0L)
          claimFold(rs.map { case (id, ts, _, _) => (id, ts) },
            state, bucketTtlMs, oncePerDoc = false) { (id, nd, owner) =>
            BandVerdict(id, band, neardup = nd, owner = owner)
          }
      }
  }

  /** Per-(doc, fingerprint) ingest verdict from [[winnowStream]]:
    * `neardup` iff the winnow fingerprint was already claimed by a
    * DIFFERENT document. A doc is a partial-copy suspect when >=
    * minShared of its fingerprints report neardup — the same evidence
    * rule as the batch q50c (single-fp coincidences are noise).
    */
  final case class FpVerdict(doc_id: Long, fp: Long, neardup: Boolean, owner: Long)

  /** Streaming WINNOW guard — the streaming twin of q50c (and of
    * CorpusPrep's stage 4a): each arriving document's winnow
    * fingerprints (Schleimer/Wilkerson/Aiken selection, computed
    * map-side by THE batch array kernel `CurationOps.winnowSelectedOf`
    * — one code path, fingerprints cannot drift between twins) claim
    * keyed state; a later document landing on a claimed fingerprint is
    * flagged against the owner. Position-local evidence: a copied block
    * >= w+k−1 tokens INSIDE otherwise-fresh text shares fingerprints by
    * the winnowing guarantee, which whole-doc MinHash bands
    * ([[neardupStream]]) dilute below their band floor — the two guards
    * catch structurally different duplicates and compose.
    *
    * Scale/state design: identical to [[neardupStream]] — two longs per
    * occupied fingerprint (owner, last-touch), event-time TTL expiry, so
    * state rides the fingerprint density (~2/(w+1) per token) of docs
    * active inside the retention horizon. Within a micro-batch rows
    * apply in (ts, doc_id) order — deterministic under replay; a late
    * watermark-admissible arrival never shrinks an expiry.
    */
  def winnowStream(
      spark: SparkSession,
      docs: DataFrame,
      k: Int = 5,
      w: Int = 4,
      watermarkDelay: String = "2 hours",
      fpTtlMs: Long = 24L * 3600 * 1000): Dataset[FpVerdict] = {
    import spark.implicits._
    val selected = graft.operators.CurationOps.winnowSelectedOf(
      docs
        .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
        .withWatermark("event_time", watermarkDelay),
      k, w, carry = Seq("event_time"))
    selected
      .select(col("doc_id"), col("event_time"), col("fp"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey { case (_, _, fp) => fp }
      .flatMapGroupsWithState[BucketState, FpVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (fp: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[BucketState]) =>
          // ONE verdict per (doc, fp) — oncePerDoc dedupes the multi-
          // position selections while every row still advances last-touch
          claimFold(rows.toSeq.map { case (id, ts, _) => (id, ts) },
            state, fpTtlMs, oncePerDoc = true) { (id, nd, owner) =>
            FpVerdict(id, fp, neardup = nd, owner = owner)
          }
      }
  }

  /** Streaming DECONTAMINATION guard — the streaming twin of q82: flag
    * each arriving document whose k-token windows hit the held-out
    * benchmark index, at ingest time, before a contaminated doc ever
    * lands in the train lake. The index ([[graft.operators.CurationOps
    * .heldoutIndex]] — built once per benchmark freeze) is a STATIC
    * frame, so the probe is a stateless stream-static hash join on the
    * 60-bit window keys; arriving docs hash through THE same kernel as
    * the batch query (`CurationOps.windowHashesOf`), so a doc flagged
    * here is exactly a doc q82 would flag. The only state is the
    * watermark-bounded per-doc aggregation that folds window hits into
    * one verdict row (q82's columns: n_ngrams, n_hits, drop), emitted
    * when the watermark passes the doc's event time. Docs shorter than
    * k tokens have no window and emit no row — same as the batch query.
    */
  def decontaminateStream(
      spark: SparkSession,
      docs: DataFrame,
      heldout: DataFrame,
      k: Int = 13,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val wm = docs
      .withColumn("event_time", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      .withWatermark("event_time", watermarkDelay)
    graft.operators.CurationOps.windowHashesOf(wm, k, carry = Seq("event_time"))
      .join(broadcast(heldout.withColumn("hit", lit(1))), Seq("rh"), "left")
      .groupBy(col("doc_id"), col("event_time"))
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_hits"))
      .withColumn("drop", col("n_hits") > 0)
  }
}
