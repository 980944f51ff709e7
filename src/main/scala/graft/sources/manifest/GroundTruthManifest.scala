package graft.sources.manifest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SageMaker Ground Truth manifest source (the reference's labeling-job
  * output, object-detection/ground_truth/output.manifest): JSONL with one
  * image per line — `source-ref` URI, a job-keyed struct carrying
  * `image_size` and `annotations[class_id, top, left, height, width]`.
  *
  * Reading is one distributed JSON scan; the bbox table explodes to one row
  * per box with [0,1]-normalized geometry (ground_truth_od.py
  * compute_bb_data), ready for the IoU / split / class-stat operators.
  */
object GroundTruthManifest {

  private val boxSchema = StructType(Seq(
    StructField("class_id", LongType),
    StructField("top", DoubleType),
    StructField("left", DoubleType),
    StructField("height", DoubleType),
    StructField("width", DoubleType)))

  private def labelSchema = StructType(Seq(
    StructField("image_size", ArrayType(StructType(Seq(
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("depth", LongType))))),
    StructField("annotations", ArrayType(boxSchema))))

  /** The job-metadata section SageMaker writes alongside the labels
    * (`<job>-metadata`): per-object consolidation confidence (position-
    * aligned with `annotations`), the class-map, and provenance fields.
    */
  private def metadataSchema = StructType(Seq(
    StructField("objects", ArrayType(StructType(Seq(
      StructField("confidence", DoubleType))))),
    StructField("class-map", MapType(StringType, StringType)),
    StructField("human-annotated", StringType),
    StructField("creation-date", StringType),
    StructField("type", StringType)))

  /** Raw manifest rows: (source_ref, image width/height, annotations,
    * per-box confidences, class-map, human_annotated).
    */
  def read(spark: SparkSession, path: String, labelKey: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("source-ref", StringType),
      StructField(labelKey, labelSchema),
      StructField(s"$labelKey-metadata", metadataSchema)))
    spark.read.schema(schema).json(path)
      .select(
        col("source-ref").as("source_ref"),
        col(s"`$labelKey`.image_size")(0).getField("width").as("img_width"),
        col(s"`$labelKey`.image_size")(0).getField("height").as("img_height"),
        col(s"`$labelKey`.annotations").as("annotations"),
        col(s"`$labelKey-metadata`.objects.confidence").as("confidences"),
        col(s"`$labelKey-metadata`.`class-map`").as("class_map"),
        col(s"`$labelKey-metadata`.`human-annotated`").as("human_annotated"))
  }

  /** One row per bounding box with normalized geometry, the position-
    * aligned consolidation confidence, and the class-map name.
    */
  def boxes(spark: SparkSession, path: String, labelKey: String): DataFrame =
    read(spark, path, labelKey)
      .select(col("source_ref"), col("img_width"), col("img_height"), col("class_map"),
        posexplode(col("annotations")).as(Seq("box_no", "box")),
        col("confidences"))
      .select(
        col("source_ref"), col("box_no"),
        col("box.class_id").as("class_id"),
        element_at(col("class_map"), col("box.class_id").cast("string")).as("class_name"),
        element_at(col("confidences"), col("box_no") + 1).as("confidence"),
        (col("box.left") / col("img_width")).as("xmin"),
        ((col("box.left") + col("box.width")) / col("img_width")).as("xmax"),
        (col("box.top") / col("img_height")).as("ymin"),
        ((col("box.top") + col("box.height")) / col("img_height")).as("ymax"),
        (col("box.width") * col("box.height") / (col("img_width") * col("img_height"))).as("area"))

  /** Mean consolidated-box confidence per image, 0.0 for box-less images —
    * ground_truth_od.py compute_img_confidence (:189) as one aggregation
    * over the manifest.
    */
  def imgConfidence(spark: SparkSession, path: String, labelKey: String): DataFrame =
    // one scan, no join: the confidences array is already per-image
    read(spark, path, labelKey)
      .select(col("source_ref"),
        when(size(col("confidences")) > 0,
          aggregate(col("confidences"), lit(0.0), (acc, x) => acc + x) / size(col("confidences")))
          .otherwise(lit(0.0)).as("img_confidence"))

  /** Per-image and per-class statistics (the notebook's dataset QA step). */
  def classStats(spark: SparkSession, path: String, labelKey: String): DataFrame =
    boxes(spark, path, labelKey)
      .groupBy("class_id")
      .agg(
        count(lit(1)).as("n_boxes"),
        countDistinct(col("source_ref")).as("n_images"),
        avg(col("area")).as("avg_area"))
      .orderBy("class_id")
}
