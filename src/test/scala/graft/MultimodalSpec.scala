package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.multimodal.ImageOps
import graft.sources.rosbag.RosbagReader

class MultimodalSpec extends SparkSpec {

  /** End-to-end: synthesized bag -> image frames -> feature extraction. */
  private lazy val bagPath: String = {
    val dir = Files.createTempDirectory("mmbag")
    // 2x1 rgb8 image: pixel0 = (10,20,30), pixel1 = (50,60,70)
    val px = Array[Byte](10, 20, 30, 50, 60, 70)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        BagWriter.message(0, 1600000000L, 0, BagWriter.imagePayload(0, 2, 1, "rgb8", px)) ++
        BagWriter.message(0, 1600000001L, 0, BagWriter.imagePayload(1, 2, 1, "8UC3", px)) ++
        BagWriter.message(0, 1600000002L, 0, BagWriter.imagePayload(2, 2, 1, "rgb8", px)) ++
        BagWriter.message(0, 1600000003L, 0, BagWriter.imagePayload(3, 2, 1, "rgb8", px))
    val f = dir.resolve("mm.bag")
    Files.write(f, BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    f.toString
  }

  test("features(): channel means via the deterministic decode stub") {
    val frames = RosbagReader.images(spark, bagPath)
    val feats = ImageOps.features(spark, frames).collect().sortBy(_.time_ns)
    val rgb = feats(0)
    assert(rgb.mean_r === 30.0 && rgb.mean_g === 40.0 && rgb.mean_b === 50.0)
    assert(rgb.brightness === 40.0)
    // 8UC3 is BGR: channels swap (reference bagstream.py:257)
    val bgr = feats(1)
    assert(bgr.mean_r === 50.0 && bgr.mean_b === 30.0)
  }

  test("sampleFrames(): every-nth selection per topic") {
    val frames = RosbagReader.images(spark, bagPath)
    val sampled = ImageOps.sampleFrames(frames, 2).select("frame_no").collect().map(_.getInt(0)).sorted
    assert(sampled.toSeq === Seq(0, 2))
  }

  test("resizePlan(): aspect-preserving target dims, no upscale") {
    val frames = RosbagReader.images(spark, bagPath)
    val r = ImageOps.resizePlan(frames, 1).select("target_width", "target_height").collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    val same = ImageOps.resizePlan(frames, 100).select("target_width").collect()(0)
    assert(same.getLong(0) === 2L) // maxSide > dims: unchanged
  }

  test("blurPlan(): clamped regions joined to frames") {
    val frames = RosbagReader.images(spark, bagPath)
    val regions = spark.createDataFrame(Seq(
      (bagPath, "/cam0/image_raw", 1600000000L * 1000000000L, 0L, 0L, 1L, 1L)
    )).toDF("bag", "topic", "time_ns", "region_x", "region_y", "region_w", "region_h")
    // region key must match the frame's bag path as read by binaryFile (file:// prefix)
    val fr = frames.withColumn("bag", lit(bagPath))
    val plan = ImageOps.blurPlan(fr, regions).collect()
    assert(plan.length === 1)
    val p = plan(0)
    assert(p.getAs[Long]("x1") === 0L && p.getAs[Long]("x2") === 2L) // clamped to width
  }
}
