package graft

import graft.operators.LaserOps

class LaserOpsSpec extends SparkSpec {

  private val E = 1e-9
  private def scan(t: Long, ranges: Seq[Float], amin: Float = -1.5f, amax: Float = 1.5f,
      rmin: Float = 0.5f, rmax: Float = 10.0f, topic: String = "/scan") =
    ("b1", topic, t, t, "laser", amin, amax, 0.01f, 0.0f, 0.1f, rmin, rmax, ranges)

  private def df(rows: Seq[(String, String, Long, Long, String, Float, Float,
      Float, Float, Float, Float, Float, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("bag", "topic", "time_ns", "seq", "frame_id", "angle_min", "angle_max",
      "angle_increment", "time_increment", "scan_time", "range_min", "range_max", "ranges")
  }

  test("healthy scans: zero dropout, exact range stats, span carried") {
    val r = LaserOps.scanHealth(df(Seq(
      scan(0, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      scan(1, Seq(2.0f, 2.0f, 2.0f, 2.0f))))).collect()
    assert(r.length === 1)
    val s = r.head
    assert(s.getAs[Long]("n_scans") === 2L)
    assert(math.abs(s.getAs[Double]("mean_beams") - 4.0) < E)
    assert(math.abs(s.getAs[Double]("dropout_frac")) < E)
    assert(math.abs(s.getAs[Double]("mean_valid_range") - 2.25) < E)
    assert(math.abs(s.getAs[Double]("min_valid_range") - 1.0) < E)
    assert(math.abs(s.getAs[Double]("min_angular_span") - 3.0) < 1e-6)
  }

  test("failing scanner signatures: NaN/Inf/out-of-band returns count as dropout") {
    // NaN and Inf are the standard no-return encodings; 0.1 sits below
    // range_min, 11 above range_max — 4 of 5 beams dropped
    val r = LaserOps.scanHealth(df(Seq(
      scan(0, Seq(Float.NaN, Float.PositiveInfinity, 0.1f, 11.0f, 2.0f))))).collect().head
    assert(math.abs(r.getAs[Double]("dropout_frac") - 0.8) < E)
    assert(math.abs(r.getAs[Double]("mean_valid_range") - 2.0) < E)
    assert(math.abs(r.getAs[Double]("min_valid_range") - 2.0) < E)
    // a fully-dead scan: dropout 1.0, range stats NULL (no reading, not 0)
    val dead = LaserOps.scanHealth(df(Seq(
      scan(0, Seq(Float.NaN, Float.NaN))))).collect().head
    assert(math.abs(dead.getAs[Double]("dropout_frac") - 1.0) < E)
    assert(dead.isNullAt(dead.fieldIndex("mean_valid_range")))
    assert(dead.isNullAt(dead.fieldIndex("min_valid_range")))
  }

  test("collapsed field of view reads in the span columns; topics stay independent") {
    val r = LaserOps.scanHealth(df(Seq(
      scan(0, Seq(1.0f), amin = -1.5f, amax = 1.5f),
      scan(1, Seq(1.0f), amin = -0.1f, amax = 0.1f), // FOV collapsed
      scan(0, Seq(5.0f), topic = "/scan2")))).collect()
    assert(r.length === 2)
    val byTopic = r.map(x => x.getAs[String]("topic") -> x).toMap
    assert(math.abs(byTopic("/scan").getAs[Double]("min_angular_span") - 0.2) < 1e-6)
    assert(math.abs(byTopic("/scan").getAs[Double]("max_angular_span") - 3.0) < 1e-6)
    assert(byTopic("/scan2").getAs[Long]("n_scans") === 1L)
  }
}
