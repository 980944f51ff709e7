package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityOps

/** Data-quality operators: anomaly flags (q79) and expectation audit (q80). */
class QualityOpsSpec extends SparkSpec {

  test("q79 anomalies match a naive per-type z-score recompute") {
    val rows = Tables.events(spark, sf).select("event_id", "event_type", "value").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val expected = byType.toSeq.flatMap { case (_, rs) =>
      val xs = rs.map(_.getAs[Double]("value"))
      val n = xs.length
      val mean = xs.sum / n
      val std = math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
      rs.filter(r => math.abs(r.getAs[Double]("value") - mean) > 3.0 * std)
        .map(_.getAs[Long]("event_id"))
    }.toSet
    val got = QualityOps.anomalies(spark, sf).collect().map(_.getAs[Long]("event_id")).toSet
    assert(got === expected)
    // flagged rows really are >3 sigma: zscore magnitude over 3
    QualityOps.anomalies(spark, sf).collect()
      .foreach(r => assert(math.abs(r.getAs[Double]("zscore")) > 3.0))
  }

  test("q80 audit counts violations in one scan and flags passes consistently") {
    val audit = QualityOps.expectationAudit(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass")))
      .toMap
    assert(audit.size === QualityOps.lineitemExpectations.size)
    val total = Tables.lineitem(spark, sf).count()
    audit.values.foreach { case (n, v, pass) =>
      assert(n === total && v >= 0 && (pass === (v == 0L)))
    }
    // the deliberately-tight check fires and matches a direct count
    val extreme = Tables.lineitem(spark, sf).filter(col("l_quantity") > 45.0).count()
    assert(audit("quantity_not_extreme")._2 === extreme && extreme > 0)
    // the plan is ONE aggregation over one scan — no joins, no shuffling
    // beyond the single-row agg
    val p = QualityOps.expectationAudit(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("FileScan")) === 1, p)
  }
}
