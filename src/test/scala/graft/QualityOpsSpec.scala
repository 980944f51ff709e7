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
  test("q112 level shift: a clean step flags a contiguous run peaking exactly at the boundary") {
    import spark.implicits._
    // 30 values at 0 then 30 at 10, one channel — each value is
    // individually unremarkable (q79's 3-sigma gate stays silent: max
    // |z| = 1 at sigma = 5), but the window means separate hard
    val e = (0 until 60).map(i =>
      (i.toLong, "a", i.toLong * 1000L, if (i < 30) 0.0 else 10.0))
      .toDF("event_id", "event_type", "ts", "value")
    val w = 10
    val out = QualityOps.levelShiftOf(e, w, thresh = 3.0)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("shift_z")).toMap
    assert(out.nonEmpty)
    // the maximal shift sits exactly AT the first post-step event, and
    // reads the analytic value 10 / (5 * sqrt(2/w))
    val peak = out.maxBy { case (_, z) => math.abs(z) }
    assert(peak._1 === 30L)
    assert(math.abs(peak._2 - 10.0 / (5.0 * math.sqrt(2.0 / w))) < 1e-12)
    // flagged positions form one contiguous run around the boundary —
    // a level shift is an EVENT, not scattered noise
    val ids = out.keys.toSeq.sorted
    assert(ids === (ids.head to ids.last))
    assert(ids.contains(30L))
    // and q79's point gate indeed stays silent on the same series: no
    // value is 3 sigma from the channel mean
    val xs = (0 until 60).map(i => if (i < 30) 0.0 else 10.0)
    val mean = xs.sum / xs.length
    val std = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
    assert(xs.forall(x => math.abs(x - mean) <= 3.0 * std))
  }

  test("q112 level shift: constant and alternating channels emit nothing; edges never half-window") {
    import spark.implicits._
    val const = (0 until 40).map(i => (i.toLong, "c", i.toLong * 1000L, 7.0))
    val alt = (0 until 40).map(i => (100L + i, "d", i.toLong * 1000L, if (i % 2 == 0) 1.0 else -1.0))
    val e = (const ++ alt).toDF("event_id", "event_type", "ts", "value")
    // constant: sigma = 0 gated; alternating: window means agree, z ~ 0
    assert(QualityOps.levelShiftOf(e, 10, thresh = 3.0).count() === 0L)
    // edges: a frame too short for ANY full window emits nothing rather
    // than half-window artifacts
    val short = (0 until 12).map(i => (200L + i, "s", i.toLong * 1000L, if (i < 6) 0.0 else 50.0))
      .toDF("event_id", "event_type", "ts", "value")
    assert(QualityOps.levelShiftOf(short, 10, thresh = 3.0).count() === 0L)
  }

  test("q112b sharded == q112 window form bit-exactly, with chunks small enough to force edge replication") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // two channels, enough rows for many chunks at chunk = 16; values
    // with a couple of genuine level shifts baked in so the flagged set
    // is non-empty
    val e = (0 until 400).flatMap { i =>
      val base = if (i % 3 == 0) "x" else "y"
      val shift = if (i > 250) 6.0 else 0.0
      Seq((i.toLong, base, i.toLong * 1000L, rng.nextGaussian() + shift))
    }.toDF("event_id", "event_type", "ts", "value")
    val w = 10
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Double, Double, Double)] =
      df.collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("mean_before"), r.getAs[Double]("mean_after"),
        r.getAs[Double]("shift_z"))).sortBy(_._1).toSeq
    val win = canon(QualityOps.levelShiftOf(e, w, thresh = 2.5))
    val sh = canon(QualityOps.levelShiftShardedOf(spark, e, w, thresh = 2.5,
      chunk = 16, bucketNs = 50L * 1000L))
    assert(win.nonEmpty, "fixture produced no flags — not a meaningful equality")
    assert(sh === win) // double bits included: the decimal prefix sums ARE the frame sums
    // and at a chunk larger than any channel (no replication at all)
    val sh2 = canon(QualityOps.levelShiftShardedOf(spark, e, w, thresh = 2.5,
      chunk = 1 << 20, bucketNs = 1000L * 1000L))
    assert(sh2 === win)
    // chunk < w is a contract violation, loudly
    intercept[IllegalArgumentException](
      QualityOps.levelShiftShardedOf(spark, e, w, thresh = 2.5, chunk = 5, bucketNs = 1000L))
  }

  test("q112/q112b: a sub-resolution-jitter channel (carrier-rounded variance goes NaN) never alarms") {
    import spark.implicits._
    // constant 5e-7: each value rounds to 1e-6 at the carrier's scale 6
    // but value^2 rounds to 0, so E[x^2] - E[x]^2 = -1e-12 and sigma =
    // sqrt(negative) = NaN. NaN > 0.0 is TRUE in Spark's ordering — the
    // review finding: without the isnan gate every full-window row
    // alarmed with a NaN z in the window form while the sharded kernel
    // (Scala's !(NaN > 0.0)) emitted nothing, breaking their pinned
    // bit-equality.
    val e = (0 until 80).map(i => (i.toLong, "nanch", i.toLong * 1000L, 5e-7))
      .toDF("event_id", "event_type", "ts", "value")
    assert(QualityOps.levelShiftOf(e, 10, thresh = 3.0).count() === 0L)
    assert(QualityOps.levelShiftShardedOf(spark, e, 10, thresh = 3.0,
      chunk = 16, bucketNs = 1000L).count() === 0L)
  }

}
