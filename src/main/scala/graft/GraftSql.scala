package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL interface: register the lake as temp views so every capability is
  * reachable from `spark.sql(...)` — the equivalent of the reference's
  * Athena/DynamoDB query surface, plus graft's native functions
  * (graft_dot, graft_charhash) which resolve in SQL via GraftExtensions.
  */
object GraftSql {

  private val tables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")

  /** Register every test-lake table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Convenience: register + run. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }

  /** Register every operator in the library as a temp view (lazy — nothing
    * executes until queried), so the whole catalog is composable from SQL:
    * `SELECT * FROM q42_dedup_minhash JOIN documents ON doc_a = doc_id`.
    */
  def registerQueries(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
}
