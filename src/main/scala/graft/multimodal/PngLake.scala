package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE one definition of how an exported PNG directory is listed and keyed.
  *
  * Every consumer — the audit's manifest reconciliation, its decode-verify
  * pass, and the re-ingest path — must agree byte-for-byte on the
  * `file_name` key (the path RELATIVE to the export root, per-camera
  * subdirectories included), or missing/orphan findings and re-ingested
  * identities silently diverge. Columns: `file_name`, `content` (drop
  * `content` when only names are needed — binaryFile prunes the read to
  * metadata).
  */
object PngLake {
  def list(spark: SparkSession, pngDir: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(pngDir)
    val sep = java.util.regex.Pattern.quote(dir.toUri.getPath.stripSuffix("/") + "/")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .option("recursiveFileLookup", "true")
      .load(pngDir)
      .select(element_at(split(col("path"), sep), -1).as("file_name"),
        col("content"))
  }
}
