package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

import graft.GraftSession
import graft.sources.rosbag.RosbagReader

/** Continuous bag ingest: the reference's queue-driven arrival model (SQS
  * message per uploaded bag -> Fargate task, main.py) as a Structured
  * Streaming file-watch job. New `.bag` files landing under `watchDir` are
  * discovered by the checkpointed file source, and each micro-batch runs
  * the SAME single-pass demux as the batch job — only file PATHS flow
  * through the stream; the bag bytes are read by the chunk-streaming
  * parser inside the batch, never materialized as a stream column.
  *
  * Delivery: foreachBatch is at-least-once, so each batch OVERWRITES its
  * own `<table>/batch=<id>/` subdirectory — a retried batch rewrites the
  * same directory instead of appending duplicates (effectively-once).
  * Readers see `batch` as a discovered partition column.
  *
  * Producer contract (the standard file-source one): uploads must be
  * staged outside the watch glob (different directory or extension) and
  * RENAMED into place — a file discovered mid-copy would be parsed
  * truncated and marked as seen.
  */
object BagIngestStream {

  /** The binaryFile source schema (the source requires it verbatim). Only
    * `path` is ever SELECTED, and the format reads file bytes lazily per
    * requested column, so bag contents never enter the stream.
    */
  private val fileSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("modificationTime", TimestampType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("content", BinaryType)))

  def start(spark: SparkSession, watchDir: String, out: String, checkpoint: String,
      piiRegions: Option[DataFrame] = None, imageDedup: Option[Int] = None,
      voxel: Option[Double] = None,
      frameIndexLake: Option[String] = None,
      audioDedup: Option[Int] = None,
      // q110's PSI gauge for the CAMERA column (a monitor, not a gate):
      // with a frozen brightness reference supplied
      // (ImageOps.brightnessDriftReference, captured offline from a
      // healthy recording's RAW frames), every batch's brightness
      // distribution is PSI-scored and the bucket table + rollup land in
      // the versioned <out>/frame_drift table — the alarm that fires when
      // a camera goes bad (exposure fault, obstruction) BEFORE any
      // downstream consumer errors. The CorpusPrepStream driftRef
      // convention, one modality over.
      frameDriftRef: Option[graft.operators.TextAnalysisOps.DriftRef] = None,
      // the same gauge on the MICROPHONE column (per-clip RMS vs a frozen
      // healthy reference — AudioOps.rmsDriftReference), landing in
      // <out>/clip_drift. Four modalities, one PSI contract.
      clipDriftRef: Option[graft.operators.TextAnalysisOps.DriftRef] = None,
      // and on the LIDAR column (per-sweep point population vs a frozen
      // healthy reference — PointCloudOps.cloudDriftReference), landing
      // in <out>/cloud_drift. Fifth modality, same PSI contract.
      cloudDriftRef: Option[graft.operators.TextAnalysisOps.DriftRef] = None,
      // cross-modal sensor-sync audit (q111's lake form, TemporalOps
      // .sensorSyncLakeOf) per arriving batch: camera frames vs clip and
      // cloud timestamps, per (bag, window of this many ns), landing in
      // the versioned <out>/sensor_sync table
      syncAuditBucketNs: Option[Long] = None): StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.bag")
      .schema(fileSchema)
      .load(watchDir)
      .select("path")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // bounded driver collect: one row per NEW bag file in this batch
        val paths = batch.collect().map(_.getString(0))
        if (paths.nonEmpty) {
          val sp = batch.sparkSession
          // per-path reads unioned (a comma in a filename must not be
          // treated as Hadoop's input-path delimiter)
          val msgs = paths.map(p => RosbagReader.messages(sp, p)).reduce(_ union _)
          // the batch job's optional stages ride per-batch too. Image
          // dedup has two modes: WITHOUT a frame index, groups are
          // within-batch only (the arriving recording's own bursts);
          // WITH --frame-index=LAKE, per-frame dHash fingerprints persist
          // to a versioned SnapshotLake probe index and the manifest
          // gains CROSS-BATCH canonical identity — a burst re-arriving in
          // a later batch collapses onto the landed canonical
          // (FrameDedupIndex, the text band guard's multimodal twin).
          // Voxel downsampling is per-cloud and thus batch-boundary-free
          // by construction.
          BagIngest.writeTablesOf(sp, msgs, out, SaveMode.Overwrite,
            writePng = false, piiRegions, tableSuffix = s"/batch=$batchId",
            imageDedup = imageDedup, voxel = voxel, audioDedup = audioDedup,
            frameIndex = frameIndexLake.map(l => (l, batchId)),
            frameDrift = frameDriftRef.map(r => (r, batchId)),
            clipDrift = clipDriftRef.map(r => (r, batchId)),
            cloudDrift = cloudDriftRef.map(r => (r, batchId)),
            syncAudit = syncAuditBucketNs.map(b => (b, batchId)))
        }
      }
      .start()

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BagIngestStream <watch-dir> <out-dir> <checkpoint-dir> " +
        "[--image-dedup[=HAMMING]] [--audio-dedup[=HAMMING]] " +
        "[--voxel=EDGE_METERS] [--frame-index=LAKE_DIR]")
    val spark = GraftSession.get()
    val (dedup, audio, voxel) = BagIngest.parseStageFlags(args)
    val frameIndex = args.collectFirst {
      case a if a.startsWith("--frame-index=") => a.stripPrefix("--frame-index=")
    }
    require(frameIndex.isEmpty || dedup.isDefined || audio.isDefined,
      "--frame-index requires --image-dedup or --audio-dedup " +
        "(the index persists the dedup fingerprints)")
    start(spark, args(0), args(1), args(2),
      imageDedup = dedup, voxel = voxel, audioDedup = audio,
      frameIndexLake = frameIndex).awaitTermination()
  }
}
