package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions
import graft.operators.{CurationOps, DedupOps}

/** The streaming twin of [[CorpusPrep]]: the corpus-curation gauntlet
  * applied to documents AS THEY ARRIVE, with the versioned lake itself as
  * the dedup state — no state store, no TTL horizon, exact "have we ever
  * accepted this" semantics at any corpus age. Reference scope: the
  * continuous-ingestion counterpart of the batch pipeline (the reference's
  * pipeline is batch-only; a 100 TB training corpus is fed by streams).
  *
  * Per micro-batch (`foreachBatch` — the incremental-batch pattern):
  *
  *   1. PII redaction + quality gate — STATELESS, the exact batch kernels
  *      ([[TextFunctions.redactPii]], [[CorpusPrep.qualityFrontier]]).
  *   2. exact dedup — min-doc_id-per-content-hash within the batch, then
  *      an anti-join against the content hashes ALREADY ACCEPTED into the
  *      lake (q62's batch-vs-corpus contract, made continuous).
  *   3. near-dup guard — MinHash band buckets ([[DedupOps.bandRows]], the
  *      same kernel as q42/q62/neardupStream): a doc drops when ANY of its
  *      bands collides with an accepted doc's bucket (the lake's persisted
  *      band index) or with a smaller-id batch-mate's bucket. First-claim
  *      semantics (the accepted doc keeps the bucket) — the stream-guard
  *      counterpart of the batch pipeline's connected-component canonical;
  *      conservative by design: a doc colliding only with a REJECTED
  *      earlier doc still drops, because its content survives through that
  *      doc's own canonical chain.
  *   4. decontamination — the arriving docs' k-token window hashes
  *      ([[CurationOps.windowHashesOf]], q82's kernel) probe the static
  *      held-out index by broadcast; any hit drops the doc before it ever
  *      lands in the train lake.
  *
  * Survivors append to `<lake>/documents`; their band buckets append to
  * `<lake>/bands` (the persisted LSH ingest index later batches probe);
  * a per-stage attrition row set appends to `<lake>/attrition` — all three
  * via [[SnapshotLake.commitStreamBatch]], so readers get snapshot
  * isolation over a live ingest and every commit is batch-id idempotent.
  *
  * Crash/redelivery contract: foreachBatch re-runs the last batch after a
  * crash, possibly after SOME of the three tables committed. Every lake
  * probe therefore excludes rows tagged with THIS batch's id
  * (`ingest_batch` column): a redelivered batch sees exactly the lake the
  * original delivery saw, recomputes the identical survivor set, and each
  * table's commitStreamBatch either lands the missing commit or skips the
  * already-landed one. A doc genuinely re-arriving in a LATER batch is
  * still caught — its landed copy carries a different batch id, so the
  * exact-hash probe sees it.
  *
  * Scale shape: each batch does batch-sized kernel work (redact, shingle,
  * minhash, window-hash) plus three joins against the lake — the hash and
  * bucket probes are equi-joins on short keys against columnar tables
  * that Spark shuffles by key, and the heldout index broadcasts. Nothing
  * driver-side grows with corpus age except the O(1)-discovery version
  * log.
  */
object CorpusPrepStream {

  final case class Config(
      minTokens: Long = 5,
      maxDupNgramRate: Double = 0.6,
      deconNgram: Int = 13)

  /** Start the guard on a streaming `docs` frame with columns
    * (doc_id: long, ts: long epoch-nanos, text: string). `heldout` is the
    * frozen benchmark window-hash index ([[CurationOps.heldoutIndex]]). */
  def start(spark: SparkSession, docs: DataFrame, heldout: DataFrame,
      lake: String, checkpoint: String, cfg: Config = Config()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch.sparkSession, batch, id, heldout, lake, cfg); ()
      }
      .start()

  /** One micro-batch through the gauntlet. Package-visible (with the
    * `beforeBands` crash seam) so the spec can drive delivery, partial
    * failure, and redelivery deterministically. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, heldout: DataFrame, lake: String, cfg: Config,
      beforeBands: () => Unit = () => ()): Unit = {
    import spark.implicits._
    val docsTable = s"$lake/documents"
    val bandsTable = s"$lake/bands"
    val attritionTable = s"$lake/attrition"

    val nInput = batch.count()
    // 1. the batch pipeline's stage-1/2 kernels, verbatim
    val quality = CorpusPrep.qualityFrontier(
        batch.select(col("doc_id"), col("ts"),
          TextFunctions.redactPii(col("text")).as("text")),
        cfg.minTokens, cfg.maxDupNgramRate)
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nQuality = quality.count()

      // lake state as of the LAST batch: rows this same batch id landed
      // (a partially-committed earlier delivery) are excluded, so a
      // redelivery recomputes against the exact pre-delivery lake
      def settled(table: String): Option[DataFrame] =
        SnapshotLake.latestVersionOf(spark, table)
          .map(_ => SnapshotLake.read(spark, table)
            .filter(col("ingest_batch") =!= batchId))

      // 2. exact dedup: batch-internal canonical, then the lake probe
      val wHash = Window.partitionBy("text_hash").orderBy("doc_id")
      val batchCanonical = quality
        .withColumn("rk", row_number().over(wHash))
        .filter(col("rk") === 1).drop("rk")
      val exact = settled(docsTable) match {
        case None => batchCanonical
        case Some(lakeDocs) => batchCanonical.join(
          lakeDocs.select("text_hash"), Seq("text_hash"), "left_anti")
      }
      val nExact = exact.count()

      // 3. near-dup guard: any band collision with an accepted bucket or
      // a smaller-id batch-mate's bucket drops the doc
      val bands = DedupOps.bandRows(exact.select("doc_id", "text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val hitLake: DataFrame = settled(bandsTable) match {
          case None => spark.emptyDataset[Long].toDF("doc_id")
          case Some(lakeBands) => bands.join(
            lakeBands.select("band", "sig"), Seq("band", "sig"), "left_semi")
            .select("doc_id").distinct()
        }
        val wBucket = Window.partitionBy("band", "sig")
        val hitBatch = bands
          .withColumn("owner", min("doc_id").over(wBucket))
          .filter(col("doc_id") =!= col("owner"))
          .select("doc_id").distinct()
        val near = exact.join(
          hitLake.unionByName(hitBatch).distinct(), Seq("doc_id"), "left_anti")
        val nNear = near.count()

        // 4. decontamination: q82's window-hash kernel against the frozen
        // held-out index — the batch twin of CorpusStreams.decontaminateStream
        val contaminated = CurationOps
          .windowHashesOf(near.select("doc_id", "text"), cfg.deconNgram)
          .join(broadcast(heldout), Seq("rh"), "left_semi")
          .select("doc_id").distinct()
        val survivors = near
          .join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("ingest_batch", lit(batchId))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nFinal = survivors.count()

          // land: three idempotent commits, probe-order-safe (documents
          // first — a crash between commits leaves a lake every probe
          // above reconstructs exactly on redelivery)
          SnapshotLake.commitStreamBatch(spark, docsTable,
            survivors.select("doc_id", "ts", "text", "text_hash",
              "n_tokens", "dup_rate", "ingest_batch"), batchId)
          beforeBands()
          SnapshotLake.commitStreamBatch(spark, bandsTable,
            bands.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
              .select(col("band"), col("sig"), col("doc_id").as("owner"))
              .withColumn("ingest_batch", lit(batchId)), batchId)
          SnapshotLake.commitStreamBatch(spark, attritionTable,
            Seq(
              ("00_input", nInput),
              ("01_quality_gate", nQuality),
              ("02_exact_dedup", nExact),
              ("03_neardup_guard", nNear),
              ("04_decontaminate", nFinal))
              .toDF("stage", "rows")
              .withColumn("ingest_batch", lit(batchId)), batchId)
        } finally survivors.unpersist(blocking = false)
      } finally bands.unpersist(blocking = false)
    } finally quality.unpersist(blocking = false)
  }
}
