package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column operators (SURVEY.md §2 `multimodal`).
  *
  * Images travel as opaque `binary` pixel columns with typed metadata
  * (width/height/encoding), exactly how the rosbag source emits them. The
  * Spark-side plumbing — schema, partition-parallel batch processing via
  * mapPartitions over typed rows, deterministic output — is real; the pixel
  * *decode* is a clearly-marked deterministic stub because no image codec
  * ships in this container (the reference does this step with Pillow,
  * service/app/bagstream.py:255). Swapping the stub for a real codec changes
  * no plumbing.
  */
object ImageOps {

  final case class Frame(bag: String, topic: String, time_ns: Long,
      width: Long, height: Long, encoding: String, step: Long, pixels: Array[Byte])

  final case class FrameFeatures(bag: String, topic: String, time_ns: Long,
      width: Long, height: Long, encoding: String,
      mean_r: Double, mean_g: Double, mean_b: Double, brightness: Double)

  /** DECODE STUB: interpret the raw buffer as channels-last uint8 with a
    * row stride (ROS Image `step`) — alignment padding beyond
    * width*channels is skipped. Deterministic stand-in for a real image
    * decode (no codec in this container); the per-partition batch shape is
    * the production path.
    */
  private def channelMeans(pixels: Array[Byte], channels: Int,
      width: Int, height: Int, step: Int): Array[Double] = {
    val rowBytes = width * channels
    val stride = if (step >= rowBytes) step else rowBytes
    val sums = new Array[Double](channels)
    var y = 0
    while (y < height && (y * stride + rowBytes) <= pixels.length) {
      var x = 0
      while (x < rowBytes) {
        sums(x % channels) += (pixels(y * stride + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = math.max(1, width * height)
    sums.map(_ / n)
  }

  /** Per-frame channel statistics (feature-extraction shape): processed
    * partition-parallel, one batch of frames per task — the Scala
    * equivalent of a `mapInPandas` batch UDF.
    */
  def features(spark: SparkSession, frames: DataFrame): Dataset[FrameFeatures] = {
    import spark.implicits._
    frames
      .select("bag", "topic", "time_ns", "width", "height", "encoding", "step", "pixels")
      .as[Frame]
      .mapPartitions(_.map { f =>
        val ch = f.encoding match {
          case "mono8" => 1
          case "rgba8" => 4
          case _       => 3 // rgb8 / bgr8 / 8UC3
        }
        val m = channelMeans(f.pixels, ch, f.width.toInt, f.height.toInt, f.step.toInt)
        val (r, g, b) = f.encoding match {
          // the reference swaps BGR->RGB for 8UC3 (bagstream.py:257)
          case "8UC3" | "bgr8" => (m(2), m(1), m(0))
          case "mono8"          => (m(0), m(0), m(0))
          case _                => (m(0), m(1), if (ch > 2) m(2) else m(0))
        }
        FrameFeatures(f.bag, f.topic, f.time_ns, f.width, f.height, f.encoding,
          r, g, b, (r + g + b) / 3.0)
      })
  }

  final case class PngFrame(bag: String, topic: String, time_ns: Long, file_name: String, png: Array[Byte])

  /** Encode frames to real PNG bytes (PngEncoder) partition-parallel — the
    * reference's per-frame `img.save(...png)` as a distributed column op.
    * Pair with a binary-file sink (or foreachPartition upload) to land the
    * same S3 layout the reference produces.
    */
  def toPng(spark: SparkSession, frames: DataFrame): Dataset[PngFrame] = {
    import spark.implicits._
    frames
      .select("bag", "topic", "time_ns", "width", "height", "encoding", "step", "pixels", "file_name")
      .map { r =>
        PngFrame(r.getAs[String]("bag"), r.getAs[String]("topic"), r.getAs[Long]("time_ns"),
          r.getAs[String]("file_name"),
          PngEncoder.encode(r.getAs[Array[Byte]]("pixels"),
            r.getAs[Long]("width").toInt, r.getAs[Long]("height").toInt,
            r.getAs[String]("encoding"), r.getAs[Long]("step").toInt))
      }
  }

  /** Deterministic temporal frame sampling: keep every nth frame per
    * (bag, topic) — the "select frames for labeling" stage. Pure filter on
    * the frame index, no shuffle.
    */
  def sampleFrames(frames: DataFrame, every: Int): DataFrame =
    frames.filter(col("frame_no") % every === 0)

  /** Resize planning: target dims preserving aspect ratio (longest side ->
    * `maxSide`), emitted as metadata. The actual resample lives behind the
    * same stub boundary as decode.
    */
  def resizePlan(frames: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    frames
      .withColumn("target_width", ceil(col("width") * scale).cast("long"))
      .withColumn("target_height", ceil(col("height") * scale).cast("long"))
      .withColumn("scale", scale)
  }

  /** PII-region blur ledger (select-labelling-imgs anonymize_PII shape):
    * join detected regions to frames and emit the blur work-list; the pixel
    * mutation itself sits behind the decode stub.
    */
  def blurPlan(frames: DataFrame, regions: DataFrame): DataFrame =
    frames.join(regions, Seq("bag", "topic", "time_ns"), "inner")
      .select(
        col("bag"), col("topic"), col("time_ns"),
        greatest(lit(0L), col("region_x") - 10).as("x1"),
        greatest(lit(0L), col("region_y") - 10).as("y1"),
        least(col("width"), col("region_x") + col("region_w") + 10).as("x2"),
        least(col("height"), col("region_y") + col("region_h") + 10).as("y2"))
}
