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
  *   kind = 'missing'  — manifest frame with no PNG on disk
  *   kind = 'orphan'   — PNG on disk with no manifest frame
  *   kind = 'gap'      — frame_no discontinuity within (bag, topic)
  *                       (check_idx's "missed {idx}")
  * An empty result is a clean audit. Both sides are distributed scans
  * (file listing via binaryFile metadata — content is never read), findings
  * come from two anti-joins and one window pass.
  */
object PngAudit {

  def audit(spark: SparkSession, manifest: DataFrame, pngDir: String): DataFrame = {
    val listed = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .option("recursiveFileLookup", "true")
      .load(pngDir)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"))
    val frames = manifest.select(col("bag"), col("topic"),
      col("frame_no").cast("long").as("frame_no"),
      element_at(split(col("file_name"), "/"), -1).as("file_name"))

    val missing = frames.join(listed, Seq("file_name"), "left_anti")
      .select(lit("missing").as("kind"), col("bag"), col("topic"), col("file_name"))
    val orphans = listed.join(frames, Seq("file_name"), "left_anti")
      .select(lit("orphan").as("kind"), lit(null).cast("string").as("bag"),
        lit(null).cast("string").as("topic"), col("file_name"))
    val w = Window.partitionBy("bag", "topic").orderBy("frame_no")
    val gaps = frames
      .withColumn("expected", row_number().over(w).cast("long") - 1)
      .filter(col("frame_no") =!= col("expected"))
      .select(lit("gap").as("kind"), col("bag"), col("topic"), col("file_name"))

    missing.union(orphans).union(gaps)
  }
}
