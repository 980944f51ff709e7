package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the test-data lake (TESTDATA.md).
  *
  * Plain parquet scans so Catalyst gets full pushdown/pruning; at cluster
  * scale these would be partitioned/bucketed lake tables, and every operator
  * downstream is agnostic to that.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `documents`, spread across the cluster when the input has fewer splits
    * than cores: per-row kernel queries (shingles, langid, fingerprints)
    * otherwise run single-threaded on a lone scan partition of a
    * small/single-file input. A many-split corpus (the 100 TB case) already
    * parallelizes and no shuffle is added.
    */
  def documentsScaled(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    if (docs.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
      docs.repartition(s.sparkContext.defaultParallelism) else docs
  }
}
