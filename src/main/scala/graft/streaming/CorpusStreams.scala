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

  /** Streaming near-dup triage: each document's MinHash band buckets
    * (computed map-side by the same `graft_shingles |> graft_minhash`
    * kernels as the batch path — one code path for both) claim keyed state;
    * a later document landing in a claimed bucket is flagged against the
    * bucket's owner. Re-deliveries of the owner itself are NOT flagged.
    *
    * Scale/state design: state is one long (the owner doc id) per occupied
    * bucket — the minimal LSH ingest index — and each bucket expires via an
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
      .flatMapGroupsWithState[Long, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // the watermark passed last-touch + TTL: the bucket's claim
            // expires and the next arrival starts a fresh ownership
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy { case (id, ts, _, _) => (ts.getTime, id) }
            var owner = state.getOption
            val out = sorted.map { case (id, _, band, _) =>
              owner match {
                case Some(o) => BandVerdict(id, band, neardup = o != id, owner = o)
                case None => owner = Some(id); BandVerdict(id, band, neardup = false, owner = id)
              }
            }
            owner.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(sorted.map(_._2.getTime).max + bucketTtlMs)
            }
            out.iterator
          }
      }
  }
}
