package graft

import graft.operators.TrajectoryOps

class TrajectoryOpsSpec extends SparkSpec {

  private val E = 1e-9
  private def pose(t: Long, x: Double, y: Double, yawQ: (Double, Double)) =
    ("b1", "/odom", t * 1000000000L, t, "odom", "base", x, y, 0.0,
      0.0, 0.0, yawQ._1, yawQ._2, 0.0, 0.0, 0.0)
  private val east = (0.0, 1.0)                                   // yaw 0
  private val north = (math.sin(math.Pi / 4), math.cos(math.Pi / 4)) // yaw π/2

  private def odomDf(rows: Seq[(String, String, Long, Long, String, String,
      Double, Double, Double, Double, Double, Double, Double, Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("bag", "topic", "time_ns", "seq", "frame_id", "child_frame_id",
      "pos_x", "pos_y", "pos_z", "ori_x", "ori_y", "ori_z", "ori_w",
      "twist_lin_x", "twist_lin_y", "twist_lin_z")
  }

  test("L-path with a dwell: path, displacement, tortuosity, speeds, yaw rate, dwell fraction") {
    // 10 m east at 1 m/s, turn, 5 m north at 1 m/s, then parked 5 s
    val rows =
      (0L to 10L).map(t => pose(t, t.toDouble, 0.0, east)) ++
      (11L to 15L).map(t => pose(t, 10.0, (t - 10).toDouble, north)) ++
      (16L to 20L).map(t => pose(t, 10.0, 5.0, north))
    val r = TrajectoryOps.trajectoryStats(odomDf(rows)).collect()
    assert(r.length === 1)
    val s = r.head
    assert(s.getAs[Long]("n_poses") === 21L)
    assert(math.abs(s.getAs[Double]("duration_s") - 20.0) < E)
    assert(math.abs(s.getAs[Double]("path_m") - 15.0) < E)
    assert(math.abs(s.getAs[Double]("displacement_m") - math.sqrt(125.0)) < E)
    assert(math.abs(s.getAs[Double]("tortuosity") - 15.0 / math.sqrt(125.0)) < E)
    assert(math.abs(s.getAs[Double]("mean_speed") - 0.75) < E)
    assert(math.abs(s.getAs[Double]("max_seg_speed") - 1.0) < E)
    // one 90° heading change over one second
    assert(math.abs(s.getAs[Double]("max_yaw_rate") - math.Pi / 2) < 1e-6)
    // parked 5 of 20 seconds
    assert(math.abs(s.getAs[Double]("dwell_frac") - 0.25) < E)
  }

  test("yaw wrap: a 350°→10° heading change reads 20°, never 340°") {
    def q(yaw: Double) = (math.sin(yaw / 2), math.cos(yaw / 2))
    val a = 2 * math.Pi * 350.0 / 360.0
    val b = 2 * math.Pi * 10.0 / 360.0
    val rows = Seq(pose(0, 0.0, 0.0, q(a)), pose(1, 1.0, 0.0, q(b)))
    val s = TrajectoryOps.trajectoryStats(odomDf(rows)).collect().head
    assert(math.abs(s.getAs[Double]("max_yaw_rate") - 2 * math.Pi * 20.0 / 360.0) < 1e-6)
  }

  test("broken streams read as their failure signatures: pose jump and frozen localizer") {
    // pose jump: one impossible 100 m/s segment
    val jump = Seq(pose(0, 0.0, 0.0, east), pose(1, 1.0, 0.0, east), pose(2, 101.0, 0.0, east))
    val j = TrajectoryOps.trajectoryStats(odomDf(jump)).collect().head
    assert(math.abs(j.getAs[Double]("max_seg_speed") - 100.0) < E)
    // frozen localizer: zero path on a 10 s recording — dwell 100%,
    // tortuosity UNMEASURED (null), never infinite
    val frozen = (0L to 10L).map(t => pose(t, 3.0, 4.0, east))
    val f = TrajectoryOps.trajectoryStats(odomDf(frozen)).collect().head
    assert(f.getAs[Double]("path_m") === 0.0)
    assert(f.getAs[Double]("displacement_m") === 0.0)
    assert(f.isNullAt(f.fieldIndex("tortuosity")))
    assert(math.abs(f.getAs[Double]("dwell_frac") - 1.0) < E)
  }

  test("multiple recordings stay independent: one row per (bag, topic)") {
    val a = (0L to 5L).map(t => pose(t, t.toDouble, 0.0, east))
    val b = (0L to 5L).map(t => pose(t, 0.0, 2.0 * t, north)
      .copy(_1 = "b2"))
    val out = TrajectoryOps.trajectoryStats(odomDf(a ++ b)).collect()
    assert(out.length === 2)
    val byBag = out.map(r => r.getAs[String]("bag") -> r.getAs[Double]("path_m")).toMap
    assert(math.abs(byBag("b1") - 5.0) < E)
    assert(math.abs(byBag("b2") - 10.0) < E)
  }
  test("bag_ingest lands <out>/trajectory from the demuxed odometry topic end-to-end") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("grafttraj")
    val inner =
      BagWriter.connection(0, "/odom", "nav_msgs/Odometry") ++
        BagWriter.message(0, 1600000000L, 0, BagWriter.odometryPayload(0.0, 1.0)) ++
        BagWriter.message(0, 1600000001L, 0, BagWriter.odometryPayload(3.0, 1.0)) ++
        BagWriter.message(0, 1600000002L, 0, BagWriter.odometryPayload(7.0, 1.0))
    val bagDir = dir.resolve("bags"); Files.createDirectories(bagDir)
    Files.write(bagDir.resolve("a.bag"),
      BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    val out = dir.resolve("lake").toString
    graft.jobs.BagIngest.run(spark, bagDir.toString, out, writePng = false)
    val t = spark.read.parquet(s"$out/trajectory").collect()
    assert(t.length === 1)
    val s = t.head
    assert(s.getAs[String]("topic") === "/odom")
    assert(s.getAs[Long]("n_poses") === 3L)
    // straight line along x: 0 -> 3 -> 7 over two 1 s segments
    assert(math.abs(s.getAs[Double]("path_m") - 7.0) < 1e-9)
    assert(math.abs(s.getAs[Double]("displacement_m") - 7.0) < 1e-9)
    assert(math.abs(s.getAs[Double]("max_seg_speed") - 4.0) < 1e-9)
  }

}
