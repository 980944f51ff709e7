package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation mechanisms (SURVEY.md §4). AQE's skew-join split handles
  * most runtime skew; explicit salting is the deterministic fallback when a
  * single key dwarfs everything (the classic hot-camera / hot-document key).
  */
object SkewOps {

  /** q34 — salted join: the skewed (fact) side gets a deterministic salt,
    * the build side is replicated across all salt values, and the join key
    * becomes (key, salt) — fanning one hot key's rows across `salt`
    * partitions. The DuckDB oracle is the PLAIN join, so the parity gate
    * itself proves the rewrite preserves semantics.
    */
  def saltedJoin(s: SparkSession, d: String, saltBuckets: Int = 4): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("salt", pmod(col("l_linenumber"), lit(saltBuckets)))
    val build = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    fact.join(build, col("l_orderkey") === col("o_orderkey") && fact("salt") === build("salt"))
      .filter(col("o_orderpriority") === "1-URGENT" && col("l_quantity") >= 30)
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber")
  }
}
