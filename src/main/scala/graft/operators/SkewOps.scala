package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation mechanisms (SURVEY.md §4). AQE's skew-join split handles
  * most runtime skew; explicit salting is the deterministic fallback when a
  * single key dwarfs everything (the classic hot-camera / hot-document key).
  */
object SkewOps {

  /** Generic deterministic salted equi-join: the skewed side gets a
    * per-row salt (hash of the whole row, so one hot key's rows fan across
    * `saltBuckets` sub-keys), the small side is replicated across every
    * salt value, and the join runs on `keys` + salt. Output is exactly the
    * plain equi-join on `keys` (the salt column never escapes); cost is
    * `saltBuckets` x the small side's shuffle volume — the explicit
    * fallback for hot keys AQE's runtime skew split can't save (e.g. one
    * key holding half the corpus). Both inputs must share the key column
    * names (rename before calling).
    */
  def saltedEquiJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1; got $saltBuckets")
    require(!(skewed.columns ++ small.columns).contains("__salt"),
      "inputs must not already carry a __salt column")
    // resolve via the DataFrame (not col(name)): a column literally named
    // "a.b" must not parse as nested-field access
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(skewed(_)): _*), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** q34 — the salted join exercised end-to-end on the lake. The DuckDB
    * oracle is the PLAIN join, so the parity gate itself proves
    * [[saltedEquiJoin]] preserves semantics.
    */
  def saltedJoin(s: SparkSession, d: String, saltBuckets: Int = 4): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val build = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    saltedEquiJoin(fact, build, Seq("l_orderkey"), saltBuckets)
      .filter(col("o_orderpriority") === "1-URGENT" && col("l_quantity") >= 30)
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber")
  }
}
