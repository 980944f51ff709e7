package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** The graft_topk typed imperative aggregate (q11b). */
class TopKAggregateSpec extends SparkSpec {

  test("q11b matches the window formulation row for row") {
    val viaWindow = RelationalOps.topkPerGroup(spark, sf).collect().map(_.toSeq)
    val viaAgg = RelationalOps.topkPerGroupAgg(spark, sf).collect().map(_.toSeq)
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("plan: partial aggregation, no window, no sort of the input") {
    val p = RelationalOps.topkPerGroupAgg(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), p) // map-side bounded heaps
    assert(!p.contains("Window"), p)
    // the only sorts allowed are AFTER aggregation (presentation orderBy);
    // nothing may sort the raw events
    val scanLine = p.linesIterator.indexWhere(_.contains("FileScan"))
    val aggLine = p.linesIterator.indexWhere(_.contains("partial_graft_topk"))
    assert(aggLine >= 0 && scanLine >= 0)
  }

  test("result is independent of partitioning and arrival order") {
    import spark.implicits._
    val data = (1 to 5000).map(i => ((i * 2654435761L) % 7, (i % 97).toDouble, i.toLong))
    def run(shuffleTo: Int) = {
      val df = data.toDF("g", "score", "id").repartition(shuffleTo)
      df.groupBy("g")
        .agg(call_function("graft_topk", col("score"), col("id"), col("id"), lit(5)).as("top"))
        .select(col("g"), col("top"))
        .collect().map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)))
        .sortBy(_._1).toSeq
    }
    val a = run(1)
    val b = run(37)
    assert(a === b)
    // ties on score keep the SMALLEST id (row_number tiebreak)
    val g0 = a.head._2
    assert(g0.size === 5)
    val naive = data.filter(_._1 == a.head._1).map(t => (t._2, t._3))
      .sortBy(t => (-t._1, t._2)).take(5)
    assert(g0.map(s => (s(0), s(1))) === naive.map(t => (t._1, t._2)))
  }

  test("NaN scores rank above all values (Spark ORDER BY DESC) and never wedge the heap") {
    import spark.implicits._
    // One NaN arrives EARLY into a small heap; later, better-than-worst rows
    // must still be admitted (the old primitive > test was always false vs
    // NaN once it reached the head), and the NaN itself must surface FIRST,
    // exactly where row_number() OVER (ORDER BY score DESC) would put it.
    val rows = Seq(
      (1L, Double.NaN, 50L),
      (1L, 1.0, 1L), (1L, 2.0, 2L), (1L, 3.0, 3L),
      (1L, 9.0, 9L), (1L, 8.0, 8L)) // late high scores must evict 1.0 and 2.0
    val out = rows.toDF("g", "score", "id").repartition(1).groupBy("g")
      .agg(call_function("graft_topk", col("score"), col("id"), col("id"), lit(4)).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out.map(_._2) === Seq(50L, 9L, 8L, 3L))
    assert(out.head._1.isNaN)
    // and it agrees with the window formulation on the same data
    val viaWindow = rows.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 4).orderBy("rn")
      .select("id").as[Long].collect().toSeq
    assert(out.map(_._2) === viaWindow)
  }

  test("k larger than the group returns the whole group, best first") {
    import spark.implicits._
    val df = Seq((1L, 3.0, 10L), (1L, 9.0, 11L), (1L, 3.0, 7L)).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(call_function("graft_topk", col("score"), col("id"), col("id"), lit(100)).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out === Seq((9.0, 11L), (3.0, 7L), (3.0, 10L)))
  }
}
