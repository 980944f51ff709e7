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
  *   1b. LM perplexity filter (opt-in, CorpusPrep's stage 2b): arriving
  *      docs score against a FROZEN [[CurationOps.LmModel]] the caller
  *      trained offline (q90's kernel, single-sourced) — the
  *      train-offline/score-online split KenLM deployments use.
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
  * Scale shape — why per-batch work stays BATCH-sized at corpus age ≫
  * batch size (the q62 contract, continuous). Kernel work (redact,
  * shingle, minhash, window-hash) is per-arriving-doc. The two lake
  * probes are the corpus-age hazard: a naive equi-join re-scans the full
  * accepted-hash / band-index tables every micro-batch, O(corpus) IO per
  * batch. Instead both tables are PROBE INDEXES:
  *
  *   - every committed row carries a uniform 64-bit probe key (`hash_key`
  *     = xxhash64 of the content hash on `documents`; `bkey` = xxhash64
  *     of (band, sig) on `bands`), and every commit declares that key as
  *     the SnapshotLake stats column, so the manifest records each data
  *     file's [min, max] key range from the parquet footers;
  *   - [[compactIndexes]] (run periodically, like any lake compaction)
  *     re-clusters each table `repartitionByRange` over the probe key —
  *     after it, each file covers a narrow disjoint slice of the key
  *     space (width keyspace/F for F files);
  *   - the batch probe collects its own DISTINCT probe keys (bounded:
  *     ≤ docs-per-batch hashes + bands-per-doc × docs-per-batch sigs —
  *     the AnnIndexBuild bounded-driver-state pattern) and reads the lake
  *     via [[SnapshotLake.readRangeIn]]: only files whose key range
  *     contains a batch key are scanned. Against a compacted index a
  *     batch with K keys reads ≤ K of the F clustered files plus the
  *     small uncompacted tail (commits since the last compaction) —
  *     per-batch IO is O(K · corpus/F + tail), proportional to the BATCH,
  *     not the corpus, and F grows with the corpus so the per-file slice
  *     is capped by compaction's target file size.
  *
  * Pruning is correctness-free by construction: equal content hash (or
  * equal (band, sig)) implies equal probe key, so the pruned read is a
  * superset of every true match, and the exact join downstream discards
  * the rest; files without recorded stats always scan. A batch whose key
  * set exceeds `Config.maxProbeKeys` falls back to the full-scan join —
  * at that size the lake scan is amortized over the batch anyway.
  * Nothing driver-side grows with corpus age except the O(1)-discovery
  * version log.
  */
object CorpusPrepStream {

  final case class Config(
      minTokens: Long = 5,
      maxDupNgramRate: Double = 0.6,
      deconNgram: Int = 13,
      maxProbeKeys: Int = 1 << 16,
      // LM-filter threshold, used only when start() receives a frozen
      // model — the stream twin of CorpusPrep's stage 2b
      lmMaxAvgNll: Double = Double.PositiveInfinity,
      // model-based quality filter (the batch pipeline's stage 2c):
      // Some(minLogit) scores every arriving doc under the FROZEN
      // committed ClfWeights and drops below-threshold docs; None = off
      clfMinLogit: Option[Double] = None,
      // q110's PSI gauge as a per-batch MONITOR (not a gate): when a
      // frozen reference is supplied (TextAnalysisOps.driftReferenceOf,
      // captured offline from the trained-era corpus), every arriving
      // batch's RAW quality-score distribution is PSI-scored against it
      // and the bucket table + rollup land in <lake>/drift — the alarm
      // that fires when a crawl source goes bad BEFORE any gate's
      // attrition number moves. No doc is dropped by this stage.
      driftRef: Option[graft.operators.TextAnalysisOps.DriftRef] = None)

  /** The probe key every `documents` commit carries + declares as its
    * stats column: a uniform 64-bit image of the content hash, so range-
    * clustered files prune on batch key sets (see the scale-shape note). */
  private def docProbeKey: Column = xxhash64(col("text_hash"))

  /** The probe key of the `bands` index: one uniform long per (band, sig)
    * bucket — equal bucket implies equal key, so pruning by it is a
    * superset of every true bucket collision. */
  private def bandProbeKey: Column = xxhash64(col("band"), col("sig"))

  /** Periodic index maintenance: re-cluster both probe indexes
    * `repartitionByRange` over their probe keys so each data file covers
    * a narrow disjoint key slice and the per-batch [[SnapshotLake.readRangeIn]]
    * probes touch O(batch-keys) files instead of the whole table. The
    * rewrite abandons (None per table) if an ingest commit races it —
    * rerun on fresh state, exactly the [[SnapshotLake.commitRewrite]]
    * contract; the stream never pauses for maintenance. */
  def compactIndexes(spark: SparkSession, lake: String,
      targetFileRows: Long = 4L << 20): Map[String, Option[Long]] =
    Map(
      s"$lake/documents" -> recluster(spark, s"$lake/documents", "hash_key", targetFileRows),
      s"$lake/bands" -> recluster(spark, s"$lake/bands", "bkey", targetFileRows))

  private def recluster(spark: SparkSession, table: String, key: String,
      targetFileRows: Long): Option[Long] =
    SnapshotLake.latestVersionOf(spark, table).flatMap { _ =>
      val n = SnapshotLake.read(spark, table).count()
      val files = math.max(1L, (n + targetFileRows - 1) / targetFileRows).toInt
      // fill: rows from pre-upgrade files carry no probe key (NULL, or
      // the column is absent entirely) — the key derives from committed
      // columns, so compaction IS the migration: one recluster backfills
      // every old row and the whole lake prunes from then on
      val fill: Column =
        if (key == "hash_key") docProbeKey else bandProbeKey
      SnapshotLake.commitRewrite(spark, table,
        df => {
          val keyed =
            if (!df.columns.contains(key)) df.withColumn(key, fill)
            else df.withColumn(key, coalesce(col(key), fill))
          keyed.repartitionByRange(files, col(key)).sortWithinPartitions(key)
        },
        Some(key))
    }

  /** Stats-pruned lake state for a batch probe: the rows of `table` (less
    * this batch's own partial-commit rows) whose probe-key stats column
    * may contain one of `keys`. None when the table has no snapshot yet.
    * Falls back to the full snapshot when the batch's key set is too
    * large to ship as an IN-probe. */
  private def settledPruned(spark: SparkSession, table: String, statsCol: String,
      keys: Seq[Long], overflow: Boolean, batchId: Long): Option[DataFrame] =
    SnapshotLake.latestVersionOf(spark, table).flatMap { _ =>
      // an EMPTY key set means the batch frontier itself is empty — there
      // is nothing to probe, and readRangeIn would (rightly) refuse the
      // empty IN-list; None short-circuits to the no-drops path
      if (keys.isEmpty && !overflow) None
      else Some {
        // rowFilter=false: file-level pruning only. The probes' contract
        // is SUPERSET + exact join downstream, and rows from pre-upgrade
        // files (no probe-key column yet — NULL on read) must flow
        // through, not be silently dropped by an isin(); those files
        // carry no stats and always scan, so they are always included.
        val snap =
          if (overflow) SnapshotLake.read(spark, table)
          else SnapshotLake.readRangeIn(spark, table, statsCol, keys,
            rowFilter = false)
        snap.filter(col("ingest_batch") =!= batchId)
      }
    }

  /** Start the guard on a streaming `docs` frame with columns
    * (doc_id: long, ts: long epoch-nanos, text: string). `heldout` is the
    * frozen benchmark window-hash index ([[CurationOps.heldoutIndex]]). */
  def start(spark: SparkSession, docs: DataFrame, heldout: DataFrame,
      lake: String, checkpoint: String, cfg: Config = Config(),
      lm: Option[CurationOps.LmModel] = None): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch.sparkSession, batch, id, heldout, lake, cfg,
          lm = lm); ()
      }
      .start()

  /** One micro-batch through the gauntlet. Package-visible (with the
    * `beforeBands` crash seam) so the spec can drive delivery, partial
    * failure, and redelivery deterministically. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, heldout: DataFrame, lake: String, cfg: Config,
      beforeBands: () => Unit = () => (),
      probeObserver: (String, DataFrame) => Unit = (_, _) => (),
      lm: Option[CurationOps.LmModel] = None): Unit = {
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

      // 1b. LM filter (the batch pipeline's stage 2b, against a FROZEN
      // model the caller trained offline — the train-offline/score-online
      // split KenLM deployments use; persist the model frames). A doc the
      // scorer can't see (< 2 tokens) keeps — absence of evidence is not
      // a junk verdict. Static-frame joins are batch semantics inside
      // foreachBatch, and a redelivered batch rescoring against the same
      // frozen model recomputes the identical verdicts.
      val lmKept = lm match {
        case None => quality
        case Some(m) =>
          val drops = CurationOps
            .lmScoreOf(quality.select("doc_id", "text"), m, carry = Nil)
            .filter(col("avg_nll") > cfg.lmMaxAvgNll)
            .select("doc_id")
          quality.join(drops, Seq("doc_id"), "left_anti")
      }
      val nLm = if (lm.isDefined) lmKept.count() else -1L

      // 1c. model-based quality filter (the batch pipeline's stage 2c,
      // against the FROZEN committed ClfWeights — no caller-supplied
      // model needed: the artifact ships with the library). Same
      // redelivery determinism as 1b: frozen weights, identical verdicts.
      val clfKept = cfg.clfMinLogit match {
        case None => lmKept
        case Some(minLogit) =>
          val drops = graft.operators.Clf
            .scoreOf(lmKept.select("doc_id", "text"), graft.operators.Clf.frozen,
              graft.operators.ClfWeights.Buckets, carry = Nil)
            .filter(col("logit") < minLogit)
            .select("doc_id")
          lmKept.join(drops, Seq("doc_id"), "left_anti")
      }
      val nClf = if (cfg.clfMinLogit.isDefined) clfKept.count() else -1L

      // lake state as of the LAST batch, pruned to the files this batch's
      // probe keys can touch (see the scale-shape note); rows this same
      // batch id landed (a partially-committed earlier delivery) are
      // excluded, so a redelivery recomputes against the exact
      // pre-delivery lake. Key collection is bounded driver-side state:
      // at most maxProbeKeys + 1 longs, the overflow sentinel included.
      def probeKeys(df: DataFrame, key: Column): (Seq[Long], Boolean) = {
        val rows = df.select(key.as("k")).distinct().take(cfg.maxProbeKeys + 1)
        (rows.map(_.getLong(0)).toSeq, rows.length > cfg.maxProbeKeys)
      }

      // 2. exact dedup: batch-internal canonical, then the lake probe
      val wHash = Window.partitionBy("text_hash").orderBy("doc_id")
      val batchCanonical = clfKept
        .withColumn("rk", row_number().over(wHash))
        .filter(col("rk") === 1).drop("rk")
      val (hashKeys, hashOverflow) = probeKeys(batchCanonical, docProbeKey)
      val exact = settledPruned(spark, docsTable, "hash_key",
          hashKeys, hashOverflow, batchId) match {
        case None => batchCanonical
        case Some(lakeDocs) =>
          probeObserver("documents", lakeDocs)
          batchCanonical.join(
            lakeDocs.select("text_hash"), Seq("text_hash"), "left_anti")
      }
      val nExact = exact.count()

      // 3. near-dup guard: any band collision with an accepted bucket or
      // a smaller-id batch-mate's bucket drops the doc
      val bands = DedupOps.bandRows(exact.select("doc_id", "text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val (bandKeys, bandOverflow) = probeKeys(bands, bandProbeKey)
        val hitLake: DataFrame = settledPruned(spark, bandsTable, "bkey",
            bandKeys, bandOverflow, batchId) match {
          case None => spark.emptyDataset[Long].toDF("doc_id")
          case Some(lakeBands) =>
            probeObserver("bands", lakeBands)
            bands.join(
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
              "n_tokens", "dup_rate", "ingest_batch")
              .withColumn("hash_key", docProbeKey),
            batchId, statsCol = Some("hash_key"))
          beforeBands()
          SnapshotLake.commitStreamBatch(spark, bandsTable,
            bands.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
              .select(col("band"), col("sig"), col("doc_id").as("owner"))
              .withColumn("bkey", bandProbeKey)
              .withColumn("ingest_batch", lit(batchId)),
            batchId, statsCol = Some("bkey"))
          SnapshotLake.commitStreamBatch(spark, attritionTable,
            Seq(
              ("00_input", nInput),
              ("01_quality_gate", nQuality),
              ("01b_lm_filter", nLm),
              ("01c_clf_filter", nClf),
              ("02_exact_dedup", nExact),
              ("03_neardup_guard", nNear),
              ("04_decontaminate", nFinal))
              .toDF("stage", "rows")
              .withColumn("ingest_batch", lit(batchId)), batchId)
          // drift gauge (monitor, not gate): PSI of the arriving batch's
          // RAW quality-score distribution against the frozen reference —
          // one bucket table + rollup per batch in <lake>/drift. Never
          // probed, so commit order is free; redelivery recomputes the
          // identical frame (frozen ref, same batch) and the batch-id
          // commit is idempotent like the others.
          // scored on the REDACTED text: the reference is captured from
          // the trained-era lake, whose documents store redactPii'd text
          // — scoring raw arrivals against a redacted-era reference
          // would read PII density as drift (review finding: a PII-heavy
          // but in-distribution batch must NOT alarm)
          cfg.driftRef.foreach { ref =>
            SnapshotLake.commitStreamBatch(spark, s"$lake/drift",
              graft.operators.TextAnalysisOps.psiAgainst(
                graft.operators.TextAnalysisOps.qualityScoredOf(
                  batch.select(col("doc_id"),
                    TextFunctions.redactPii(col("text")).as("text"))), ref)
                .withColumn("ingest_batch", lit(batchId)), batchId)
          }
        } finally survivors.unpersist(blocking = false)
      } finally bands.unpersist(blocking = false)
    } finally quality.unpersist(blocking = false)
  }
}
