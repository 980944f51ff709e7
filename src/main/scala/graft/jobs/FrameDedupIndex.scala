package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.ImageOps

/** CROSS-BATCH perceptual identity for streaming ingest — the multimodal
  * twin of CorpusPrepStream's persisted band guard, shared by BOTH
  * 64-bit-fingerprint modalities: image frames (dHash → `frame_hashes`)
  * and audio clips (HK sign word → `clip_hashes`), one mechanism, two key
  * spaces. A continuously-arriving AV lake re-lands the same parked-car
  * burst (or re-encoded microphone clip) across bags and micro-batches;
  * within-batch dedup ([[ImageOps.dedupGroupsFrames]]) cannot see that, so
  * every batch would mint a NEW canonical for a burst the lake already
  * holds. This index makes canonical identity durable:
  *
  *   - every landed frame's 64-bit dHash is persisted to the versioned
  *     `<lake>/frame_hashes` SnapshotLake table as maxHamming+1 pigeonhole
  *     block rows ([[ImageOps.hammingBlocks]] — the SAME banding as the
  *     batch pair join), each row carrying the frame's RESOLVED canonical
  *     key, so a future hit inherits the ultimate canonical in one hop
  *     (no transitive chase at probe time);
  *   - an arriving batch hashes once, resolves within-batch components,
  *     then probes the index: arriving blocks equi-join landed blocks on
  *     (block index, block value), one exact `bit_count(xor) <= H` verify
  *     — never frame x frame — and any verified hit adopts the landed
  *     canonical. FIRST-CLAIM semantics: the landed canonical keeps
  *     ownership; adoption is per within-batch COMPONENT (min landed
  *     canonical over the members' hits), so a burst collapses whole even
  *     when only some members sit within the Hamming radius of a landed
  *     frame;
  *   - the committed rows carry `fkey` = xxhash64(block, value) declared
  *     as the SnapshotLake STATS column — the CorpusPrepStream probe-index
  *     pattern: after [[compactIndex]] re-clusters by fkey, a batch probe
  *     reads only the files whose [min, max] fkey range contains one of
  *     the batch's own block keys, so probe IO is O(batch keys), not
  *     O(corpus age). Pruning is correctness-free: equal (block, value)
  *     implies equal fkey, so the pruned read is a superset of every true
  *     collision and the exact equi-join + Hamming verify discard the
  *     rest. A batch whose key set exceeds `maxProbeKeys` falls back to
  *     the full-scan join (at that size the scan amortizes over the
  *     batch).
  *
  * Crash/redelivery contract (the CorpusPrepStream one): the probe
  * excludes rows tagged with THIS batch's id, so a redelivered batch sees
  * exactly the lake the original delivery saw and recomputes the identical
  * manifest (hashing, component labels, and min-struct adoption are all
  * deterministic); the index commit is batch-id idempotent
  * ([[SnapshotLake.commitStreamBatch]]) and the manifest sink overwrites a
  * per-batch directory — either order of partial failure reconverges.
  */
object FrameDedupIndex {

  val IndexTable = "frame_hashes"

  /** The audio twin: clip fingerprints persist under their own table —
    * the two modalities share every mechanism (banding, stats-pruned
    * probes, first-claim-per-component, the max_hamming property) but
    * never a key space. */
  val ClipIndexTable = "clip_hashes"

  /** The probe key a committed block row carries + declares as its stats
    * column: one uniform long per (block index, block value) bucket. */
  private def blockProbeKey = xxhash64(col("b"), col("v"))

  /** Process one micro-batch of frames: resolve each frame's canonical
    * (within-batch components, then lake adoption), hand the TOTAL
    * manifest (bag, topic, time_ns, canon_bag, canon_topic, canon_time_ns,
    * is_canonical) to `sink`, and commit the batch's fingerprint rows to
    * `<lake>/frame_hashes`. `sink` runs INSIDE the persist scope so the
    * manifest lands without recomputing the hash pass.
    */
  def probeAndCommit(spark: SparkSession, frames: DataFrame, lake: String,
      batchId: Long, maxHamming: Int = 3, maxProbeKeys: Int = 1 << 16,
      sink: DataFrame => Unit = _ => (),
      probeObserver: DataFrame => Unit = _ => ()): Unit =
    probeAndCommitHashes(spark, None,
      ImageOps.dhashFrames(spark, frames), s"$lake/$IndexTable",
      batchId, maxHamming, maxProbeKeys, sink, probeObserver)

  /** The AUDIO guard: [[probeAndCommit]] for a micro-batch of clips
    * (bag, topic, time_ns, sample_rate, channels, pcm — the BagIngest
    * clips table). Same mechanism end to end — only the hash pass
    * (AudioOps.fingerprintClipsByKey) and the index table differ.
    * Clips below AudioOps.fpMinWindows cannot fill the 64-bit word:
    * they stay OUT of the banded index and the probe (the
    * nearDupClips gate — unrelated shorts must never collapse on
    * shared zero padding) but appear in the manifest as their own
    * canonical. The clip index additionally pins (window, n_mels) as
    * table properties: a mid-stream dial change re-splits the word and
    * must fail loudly, exactly like max_hamming.
    */
  def probeAndCommitClips(spark: SparkSession, clips: DataFrame, lake: String,
      batchId: Long, maxHamming: Int = 3, window: Int = 256, nMels: Int = 8,
      maxProbeKeys: Int = 1 << 16,
      sink: DataFrame => Unit = _ => (),
      probeObserver: DataFrame => Unit = _ => ()): Unit = {
    import graft.multimodal.AudioOps
    val hashes = AudioOps.fingerprintClipsByKey(spark, clips, window, nMels)
      .filter(col("n_windows") >= AudioOps.fpMinWindows(nMels).toLong)
      .select("bag", "topic", "time_ns", "dhash")
    probeAndCommitHashes(spark,
      Some(clips.select("bag", "topic", "time_ns")), hashes,
      s"$lake/$ClipIndexTable", batchId, maxHamming, maxProbeKeys,
      sink, probeObserver,
      extraProps = Map("window" -> window.toString, "n_mels" -> nMels.toString))
  }

  /** The modality-blind core: everything downstream of the hash pass.
    * `hashes` carries (bag, topic, time_ns, dhash) — the rows eligible
    * for banding/probing; `allKeys` (when the modality gates some rows
    * out of the hash space, e.g. short clips) carries EVERY batch row's
    * identity so the manifest stays total — None means the hash rows ARE
    * the batch. */
  private[graft] def probeAndCommitHashes(spark: SparkSession,
      allKeys: Option[DataFrame], rawHashes: DataFrame, table: String,
      batchId: Long, maxHamming: Int, maxProbeKeys: Int,
      sink: DataFrame => Unit, probeObserver: DataFrame => Unit,
      extraProps: Map[String, String] = Map.empty): Unit = {
    // one hash pass feeds the within-batch pair join, the lake probe, and
    // the committed index rows
    val hashes = rawHashes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 1. within-batch canonical components (the batch job's manifest)
      val groups = ImageOps.dedupGroupsFromHashes(spark, hashes, maxHamming)
      val batchManifest =
        ImageOps.totalFrameManifest(allKeys.getOrElse(hashes), groups)

      // 2. the arriving frames' pigeonhole blocks
      val blocks = hashes.select(col("bag"), col("topic"), col("time_ns"),
          col("dhash"),
          explode(array(ImageOps.hammingBlocks(maxHamming): _*)).as("bk"))
        .select(col("bag"), col("topic"), col("time_ns"), col("dhash"),
          col("bk.b").as("b"), col("bk.v").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // 3. bounded driver-side probe keys (the CorpusPrepStream device:
        // at most maxProbeKeys + 1 longs, overflow sentinel included)
        val keyRows = blocks.select(blockProbeKey.as("k")).distinct()
          .take(maxProbeKeys + 1)
        val keys = keyRows.map(_.getLong(0)).toSeq
        val overflow = keyRows.length > maxProbeKeys

        // 4. lake probe: stats-pruned read, exact block equi-join, one
        // Hamming verify, min landed canonical per arriving frame
        val hits: Option[DataFrame] =
          SnapshotLake.latestVersionOf(spark, table).flatMap { _ =>
            if (keys.isEmpty && !overflow) None // empty batch: nothing to probe
            else Some {
              val snap =
                if (overflow) SnapshotLake.read(spark, table)
                else SnapshotLake.readRangeIn(spark, table, "fkey", keys,
                  rowFilter = false)
              // a partially-committed earlier delivery of THIS batch is
              // invisible: redelivery recomputes against the pre-delivery lake
              val settled = snap.filter(col("ingest_batch") =!= batchId)
              probeObserver(settled)
              blocks.join(
                  settled.select(col("b"), col("v"), col("dhash").as("l_dhash"),
                    col("canon_bag").as("lc_bag"), col("canon_topic").as("lc_topic"),
                    col("canon_time_ns").as("lc_time_ns")),
                  Seq("b", "v"))
                .filter(bit_count(col("dhash").bitwiseXOR(col("l_dhash")))
                  .cast("int") <= maxHamming)
                .groupBy("bag", "topic", "time_ns")
                // deterministic representative: lexicographically smallest
                // landed canonical (struct ordering = field order), the
                // dedupGroupsFrames canonical convention
                .agg(min(struct(col("lc_bag"), col("lc_topic"),
                  col("lc_time_ns"))).as("lc"))
                .select(col("bag"), col("topic"), col("time_ns"),
                  col("lc.lc_bag").as("lc_bag"), col("lc.lc_topic").as("lc_topic"),
                  col("lc.lc_time_ns").as("lc_time_ns"))
            }
          }

        // 5. component adoption: if ANY member of a within-batch component
        // hits the lake, the WHOLE component adopts the smallest landed
        // canonical among its members' hits — the burst collapses onto the
        // landed canonical even when only some members sit within the
        // radius of a landed frame. Components with no hits keep their
        // batch-local canonical.
        val resolved = hits match {
          case None => batchManifest
          case Some(h) =>
            val adoptedPerComp = batchManifest
              .join(h, Seq("bag", "topic", "time_ns"))
              .groupBy("canon_bag", "canon_topic", "canon_time_ns")
              .agg(min(struct(col("lc_bag"), col("lc_topic"),
                col("lc_time_ns"))).as("ad"))
            batchManifest
              .join(adoptedPerComp, Seq("canon_bag", "canon_topic", "canon_time_ns"), "left")
              .select(col("bag"), col("topic"), col("time_ns"),
                coalesce(col("ad.lc_bag"), col("canon_bag")).as("canon_bag"),
                coalesce(col("ad.lc_topic"), col("canon_topic")).as("canon_topic"),
                coalesce(col("ad.lc_time_ns"), col("canon_time_ns")).as("canon_time_ns"),
                // an adopted component's true canonical lives in an
                // EARLIER batch — no member of it is canonical here
                when(col("ad").isNotNull, lit(false))
                  .otherwise(col("is_canonical")).as("is_canonical"))
        }

        // 6. land the manifest, then the index rows (either order
        // reconverges on redelivery; manifest first so a crash between
        // the two leaves downstream consumers a complete batch manifest).
        // resolved is consumed twice (sink + index join) — persist for
        // the scope of the two jobs, released in the finally.
        val resolvedP = resolved
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          sink(resolvedP)
          val indexRows = blocks
            .join(resolvedP.select(col("bag"), col("topic"), col("time_ns"),
              col("canon_bag"), col("canon_topic"), col("canon_time_ns")),
              Seq("bag", "topic", "time_ns"))
            .withColumn("fkey", blockProbeKey)
            .withColumn("ingest_batch", lit(batchId))
            .select("bag", "topic", "time_ns", "dhash", "b", "v", "fkey",
              "canon_bag", "canon_topic", "canon_time_ns", "ingest_batch")
          // the banding is part of the index's IDENTITY: rows landed at a
          // different maxHamming split the 64 bits differently, so a
          // mixed-banding index silently loses probe recall (the Hamming
          // verify still gates correctness, but collisions stop lining
          // up). The table property makes a mid-stream dial change fail
          // LOUDLY instead — same contract as AnnIndexBuild's coding
          // marker.
          val props = Map("max_hamming" -> maxHamming.toString) ++ extraProps
          SnapshotLake.commitStreamBatch(spark, table, indexRows, batchId,
            statsCol = Some("fkey"),
            props = props, requireProps = props)
        } finally resolvedP.unpersist(blocking = false)
      } finally blocks.unpersist(blocking = false)
    } finally hashes.unpersist(blocking = false)
  }

  /** Periodic index maintenance (the CorpusPrepStream.compactIndexes
    * contract): re-cluster the fingerprint index (`frame_hashes` by
    * default; pass [[ClipIndexTable]] for the audio one) by
    * `repartitionByRange` over fkey so each data file covers a narrow
    * disjoint key slice and per-batch probes touch O(batch-keys) files.
    * Abandons (None) if an ingest commit races the rewrite — rerun on
    * fresh state; the stream never pauses for maintenance. */
  def compactIndex(spark: SparkSession, lake: String,
      targetFileRows: Long = 4L << 20,
      indexTable: String = IndexTable): Option[Long] = {
    val table = s"$lake/$indexTable"
    SnapshotLake.latestVersionOf(spark, table).flatMap { _ =>
      val n = SnapshotLake.read(spark, table).count()
      val files = math.max(1L, (n + targetFileRows - 1) / targetFileRows).toInt
      SnapshotLake.commitRewrite(spark, table,
        df => df.withColumn("fkey", coalesce(col("fkey"), blockProbeKey))
          .repartitionByRange(files, col("fkey")).sortWithinPartitions("fkey"),
        Some("fkey"))
    }
  }
}
