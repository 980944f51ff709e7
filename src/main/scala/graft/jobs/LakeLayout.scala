package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lake layout utilities (SURVEY.md §4): day-partitioned, time-sorted
  * event storage so time-range queries prune partitions at planning time
  * and range scans read sorted row groups — the difference between touching
  * 100 TB and touching one day of it.
  */
object LakeLayout {

  /** Write events day-partitioned (`day=YYYY-MM-DD/`) and sorted by ts
    * within each file. Sorting within partitions gives parquet min/max
    * row-group statistics real selectivity for ts predicates.
    */
  def writeEventsPartitioned(spark: SparkSession, sfDir: String, out: String): Unit =
    Tables.events(spark, sfDir)
      .withColumn("day", date_format(timestamp_micros(call_function("div", col("ts"), lit(1000L))), "yyyy-MM-dd"))
      .repartition(col("day"))
      .sortWithinPartitions("ts")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(out)

  /** Read back with a day predicate — Catalyst turns it into a partition
    * filter, so only the matching directories are listed/scanned.
    */
  def readDay(spark: SparkSession, lake: String, day: String): DataFrame =
    spark.read.parquet(lake).filter(col("day") === day)
}
