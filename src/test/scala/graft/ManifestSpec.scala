package graft

import java.nio.file.Files

import graft.sources.manifest.GroundTruthManifest

class ManifestSpec extends SparkSpec {

  /** Same JSONL shape as the reference's labeling-job output
    * (object-detection/ground_truth/output.manifest) — synthesized, one
    * image per line.
    */
  private lazy val manifestPath: String = {
    val dir = Files.createTempDirectory("manifest")
    val lines = Seq(
      """{"source-ref": "s3://bucket/run1/left0004.png", "av-labeling": {"image_size": [{"width": 800, "height": 600, "depth": 3}], "annotations": [{"class_id": 0, "top": 150.0, "left": 400.0, "height": 60.0, "width": 120.0}, {"class_id": 1, "top": 300.0, "left": 0.0, "height": 300.0, "width": 400.0}]}, "av-labeling-metadata": {"objects": [{"confidence": 0.61}, {"confidence": 0.81}], "class-map": {"0": "car", "1": "truck"}, "human-annotated": "yes", "creation-date": "2021-07-20T12:25:39.335109", "type": "groundtruth/object-detection"}}""",
      """{"source-ref": "s3://bucket/run1/left0008.png", "av-labeling": {"image_size": [{"width": 800, "height": 600, "depth": 3}], "annotations": [{"class_id": 0, "top": 0.0, "left": 0.0, "height": 600.0, "width": 800.0}]}, "av-labeling-metadata": {"objects": [{"confidence": 0.9}], "class-map": {"0": "car"}, "human-annotated": "yes", "creation-date": "2021-07-20T12:25:39.335109", "type": "groundtruth/object-detection"}}""",
      """{"source-ref": "s3://bucket/run1/left0012.png", "av-labeling": {"image_size": [{"width": 800, "height": 600, "depth": 3}], "annotations": []}, "av-labeling-metadata": {"objects": [], "class-map": {}, "human-annotated": "yes", "creation-date": "2021-07-20T12:25:39.335109", "type": "groundtruth/object-detection"}}""")
    val f = dir.resolve("output.manifest")
    Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  test("boxes(): explode + [0,1] normalization (compute_bb_data semantics)") {
    val b = GroundTruthManifest.boxes(spark, manifestPath, "av-labeling")
      .orderBy("source_ref", "box_no").collect()
    assert(b.length === 3)
    val first = b(0)
    assert(first.getAs[Double]("xmin") === 0.5)
    assert(first.getAs[Double]("xmax") === 0.65)
    assert(first.getAs[Double]("ymin") === 0.25)
    assert(first.getAs[Double]("ymax") === 0.35)
    val full = b(2) // whole-image box
    assert(full.getAs[Double]("area") === 1.0)
  }

  test("metadata leg: position-aligned confidence, class-map names, img confidence") {
    val b = GroundTruthManifest.boxes(spark, manifestPath, "av-labeling")
      .orderBy("source_ref", "box_no").collect()
    assert(b(0).getAs[Double]("confidence") === 0.61)
    assert(b(1).getAs[Double]("confidence") === 0.81)
    assert(b(0).getAs[String]("class_name") === "car")
    assert(b(1).getAs[String]("class_name") === "truck")
    // compute_img_confidence: mean per image, 0.0 for box-less images
    val conf = GroundTruthManifest.imgConfidence(spark, manifestPath, "av-labeling")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(conf("s3://bucket/run1/left0004.png") - 0.71) < 1e-9)
    assert(conf("s3://bucket/run1/left0008.png") === 0.9)
    assert(conf("s3://bucket/run1/left0012.png") === 0.0)
  }

  test("classStats(): per-class counts and coverage") {
    val stats = GroundTruthManifest.classStats(spark, manifestPath, "av-labeling").collect()
    val c0 = stats.find(_.getAs[Long]("class_id") == 0).get
    assert(c0.getAs[Long]("n_boxes") === 2 && c0.getAs[Long]("n_images") === 2)
    val c1 = stats.find(_.getAs[Long]("class_id") == 1).get
    assert(c1.getAs[Long]("n_boxes") === 1)
  }
}
