package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake/export reconciliation — the reference's check_pngs.py (service/
  * check_pngs.py:1976 check_idx + the produced-vs-uploaded set diff) as a
  * distributed audit instead of a hardcoded-listing script: the frame
  * manifest is the source of truth, the PNG directory is the audited copy.
  *
  * Emits one row per finding:
  *   kind = 'missing'   — manifest frame with no PNG on disk
  *   kind = 'orphan'    — PNG on disk with no manifest frame
  *   kind = 'gap'       — frame_no discontinuity within (bag, topic), one
  *                        finding per discontinuity (check_idx's "missed")
  *   kind = 'collision' — several manifest frames claim the same relative
  *                        path (they would overwrite each other on export)
  *   kind = 'corrupt'   — (decode-verify mode only) a listed PNG whose
  *                        bytes do not decode — a file that exists but
  *                        cannot be re-ingested or served for labeling
  * Comparison is on the path RELATIVE to `pngDir` (the manifest's
  * `file_name` already carries the per-camera subdirectory), never on the
  * basename — two cameras' same-named frames stay distinct. A nonexistent
  * `pngDir` is an empty export (every frame missing), not a crash: that is
  * the disaster this audit exists to report. An empty result is a clean
  * audit; listing reads file metadata only.
  */
object PngAudit {

  /** `verifyDecode = true` additionally DECODES every listed PNG
    * (partition-parallel, PngDecoder/javax.imageio) and reports undecodable
    * files as kind='corrupt' — check_pngs.py's "does the export actually
    * open" semantics, at the cost of reading file contents instead of
    * metadata only. */
  def audit(spark: SparkSession, manifest: DataFrame, pngDir: String,
            verifyDecode: Boolean = false): DataFrame = {
    import spark.implicits._
    val dir = new org.apache.hadoop.fs.Path(pngDir)
    val exists = dir.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dir)
    val listed = if (!exists) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file_name",
            org.apache.spark.sql.types.StringType))))
    } else {
      // names only: binaryFile prunes the content read to metadata
      graft.multimodal.PngLake.list(spark, pngDir).select("file_name")
    }
    val frames = manifest.select(col("bag"), col("topic"),
      col("frame_no").cast("long").as("frame_no"), col("file_name"))

    val missing = frames.join(listed, Seq("file_name"), "left_anti")
      .select(lit("missing").as("kind"), col("bag"), col("topic"), col("file_name"))
    val orphans = listed.join(frames, Seq("file_name"), "left_anti")
      .select(lit("orphan").as("kind"), lit(null).cast("string").as("bag"),
        lit(null).cast("string").as("topic"), col("file_name"))
    val collisions = frames.groupBy("file_name")
      .agg(count(lit(1)).as("n"), min("bag").as("bag"), min("topic").as("topic"))
      .filter(col("n") > 1)
      .select(lit("collision").as("kind"), col("bag"), col("topic"), col("file_name"))
    // one finding per discontinuity (not per subsequent frame): a gap exists
    // where the delta to the previous frame_no exceeds 1, or the recording
    // does not start at 0
    val w = Window.partitionBy("bag", "topic").orderBy("frame_no")
    val gaps = frames
      .withColumn("prev", lag("frame_no", 1).over(w))
      .filter((col("prev").isNull && col("frame_no") =!= 0) ||
        (col("frame_no") - col("prev") > 1))
      .select(lit("gap").as("kind"), col("bag"), col("topic"), col("file_name"))

    val base = missing.union(orphans).union(collisions).union(gaps)
    if (!verifyDecode || !exists) base
    else {
      val corrupt = graft.multimodal.PngLake.list(spark, pngDir)
        .as[(String, Array[Byte])]
        .flatMap { case (name, bytes) =>
          try { graft.multimodal.PngDecoder.decode(bytes); None }
          catch { case _: Exception => Some(name) }
        }
        .toDF("file_name")
        .select(lit("corrupt").as("kind"), lit(null).cast("string").as("bag"),
          lit(null).cast("string").as("topic"), col("file_name"))
      base.union(corrupt)
    }
  }
}
