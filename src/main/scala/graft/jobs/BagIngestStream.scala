package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

import graft.GraftSession

/** Continuous bag ingest: the reference's queue-driven arrival model (SQS
  * message per uploaded bag -> Fargate task, main.py) as a Structured
  * Streaming file-watch job. New `.bag` files landing under `watchDir` are
  * discovered by the file source (exactly-once per file, tracked in the
  * checkpoint), and each micro-batch runs the SAME single-pass demux as the
  * batch job — only file PATHS flow through the stream; the bag bytes are
  * read by the chunk-streaming parser inside the batch, never materialized
  * as a stream column. Tables append; restart resumes from the checkpoint
  * without reprocessing.
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
      piiRegions: Option[DataFrame] = None): StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.bag")
      .schema(fileSchema)
      .load(watchDir)
      .select("path")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // bounded driver collect: one row per NEW bag file in this batch
        val paths = batch.collect().map(_.getString(0))
        if (paths.nonEmpty) {
          BagIngest.writeTables(batch.sparkSession, paths.mkString(","), out,
            SaveMode.Append, writePng = false, piiRegions)
        }
      }
      .start()

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BagIngestStream <watch-dir> <out-dir> <checkpoint-dir>")
    val spark = GraftSession.get()
    start(spark, args(0), args(1), args(2)).awaitTermination()
  }
}
