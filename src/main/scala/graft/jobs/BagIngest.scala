package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.GraftSession
import graft.multimodal.ImageOps
import graft.sources.rosbag.RosbagReader

/** The reference pipeline's end-to-end job as one Spark application: ROS
  * bags in, a queryable parquet lake (+ optional PNG frames) out — the
  * Fargate-task-per-bag architecture collapsed into a cluster job where
  * each executor task demuxes whole bags in parallel.
  *
  * Usage: BagIngest <bag-path-or-glob> <out-dir> [--png] [--blur-regions <parquet>]
  *
  * Output layout:
  *   <out>/images/      frame metadata + pixel payloads (parquet)
  *   <out>/laser/ odometry/ wrench/ std_msgs/   typed topic tables
  *   <out>/manifest/    per-recording mp4/frame manifest
  *   <out>/png/         one real PNG file per frame (with --png)
  */
object BagIngest {

  def run(spark: SparkSession, bags: String, out: String, writePng: Boolean,
      piiRegions: Option[DataFrame] = None): Unit =
    writeTables(spark, bags, out, SaveMode.Overwrite, writePng, piiRegions)

  /** One demux pass over `bags` -> all seven lake tables written with
    * `mode` (Overwrite for the batch job; the streaming job overwrites a
    * per-batch subdirectory via `tableSuffix` for idempotent retries).
    */
  def writeTables(spark: SparkSession, bags: String, out: String, mode: SaveMode,
      writePng: Boolean, piiRegions: Option[DataFrame]): Unit =
    writeTablesOf(spark, RosbagReader.messages(spark, bags), out, mode, writePng, piiRegions)

  def writeTablesOf(spark: SparkSession, rawMsgs: org.apache.spark.sql.Dataset[RosbagReader.RawMessage],
      out: String, mode: SaveMode, writePng: Boolean, piiRegions: Option[DataFrame],
      tableSuffix: String = ""): Unit = {
    def save(df: DataFrame, name: String): Unit =
      df.write.mode(mode).parquet(s"$out/$name$tableSuffix")

    // parse every bag exactly once: the demuxed message set feeds all seven
    // output tables (the reference also demuxes in a single streaming pass)
    val msgs = rawMsgs.persist()
    val rawImages = RosbagReader.imagesOf(spark, msgs)
    // PII anonymization (reference: select-labelling-imgs anonymize_PII):
    // with a region table, pixels land in the lake already blurred
    val images = piiRegions match {
      case Some(regions) => ImageOps.blurFrames(spark, rawImages, regions).drop("n_blurred")
      case None          => rawImages
    }
    save(images, "images")
    save(RosbagReader.laserScansOf(spark, msgs), "laser")
    save(RosbagReader.odometryOf(spark, msgs), "odometry")
    save(RosbagReader.wrenchOf(spark, msgs), "wrench")
    save(RosbagReader.stdMsgsOf(spark, msgs), "std_msgs")
    // dynamic-schema fallback: every topic with a message_definition lands
    // as (slot-path -> value) rows even when no hand-coded decoder exists
    save(RosbagReader.genericMessagesOf(spark, msgs), "generic")
    // manifest columns are untouched by blur — build it from the RAW frames
    // so the manifest sink never re-executes the blur pipeline (Catalyst
    // cannot prune columns through the opaque mapPartitions lambda)
    save(RosbagReader.mp4ManifestOf(rawImages), "manifest")
    msgs.unpersist()

    if (writePng) {
      val dir = new java.io.File(s"$out/png")
      ImageOps.toPng(spark, spark.read.parquet(s"$out/images$tableSuffix"))
        .foreachPartition { it: Iterator[ImageOps.PngFrame] =>
          // executor-side sink: in production this is the S3 upload the
          // reference does from its uploader process (main.py Uploader)
          it.foreach { p =>
            val f = new java.io.File(dir, p.file_name)
            f.getParentFile.mkdirs()
            java.nio.file.Files.write(f.toPath, p.png)
          }
        }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BagIngest <bags> <out-dir> [--png] [--blur-regions <parquet>]")
    val spark = GraftSession.get()
    val regions = args.indexOf("--blur-regions") match {
      case -1 => None
      case i  =>
        require(i + 1 < args.length && !args(i + 1).startsWith("--"),
          "--blur-regions requires a parquet path argument")
        Some(spark.read.parquet(args(i + 1)))
    }
    run(spark, args(0), args(1), args.contains("--png"), regions)
    spark.stop()
  }
}
