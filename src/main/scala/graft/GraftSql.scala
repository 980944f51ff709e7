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
}
