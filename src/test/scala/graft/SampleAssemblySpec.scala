package graft

import graft.jobs.SampleAssembly

class SampleAssemblySpec extends SparkSpec {

  private val E = 1e-9
  private val S = 1000000000L // ns per second

  private def frames(rows: (String, String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("bag", "topic", "time_ns", "frame_no")
  }
  private def clips(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("bag", "time_ns", "clip_id")
  }
  private def odom(rows: (String, Long, Double, Double, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((b, t, x, y, z), i) => (b, t, i.toLong, x, y, z) }
      .toDF("bag", "time_ns", "seq", "pos_x", "pos_y", "pos_z")
  }

  test("assembly: interpolated speed, nearest clip with signed offset, detection rollup") {
    import spark.implicits._
    val f = frames(("b1", "/cam", 1 * S, 0L), ("b1", "/cam", 2 * S, 1L), ("b1", "/cam", 10 * S, 2L))
    // poses along x at 2 m/s: x = 2t, sampled every second 0..3 s —
    // frames at 1 s and 2 s sit inside the span, the 10 s frame outside
    val o = odom(("b1", 0L, 0.0, 0.0, 0.0), ("b1", 1 * S, 2.0, 0.0, 0.0),
      ("b1", 2 * S, 4.0, 0.0, 0.0), ("b1", 3 * S, 6.0, 0.0, 0.0))
    // a clip 100 ms before frame 0 and one 300 ms after frame 1
    val c = clips(("b1", 1 * S - 100000000L, 41L), ("b1", 2 * S + 300000000L, 42L))
    val det = Seq(("b1", "/cam", 0L, "car", 0.9), ("b1", "/cam", 0L, "person", 0.7))
      .toDF("bag", "topic", "frame_no", "label", "conf")
    val out = SampleAssembly.assembleOf(f, c, o, Some(det), clipTolNs = 2 * S)
      .collect().map(r => r.getAs[Long]("frame_no") -> r).toMap

    // frame 0 at t=1s: a pose EXACTLY at frame time is the segment's far
    // end (prev strictly before) — segment [0s, 1s]: 2 m over 1 s
    assert(math.abs(out(0L).getAs[Double]("ego_speed_mps") - 2.0) < E)
    assert(math.abs(out(1L).getAs[Double]("ego_speed_mps") - 2.0) < E)
    // frame 2 at t=10s: outside the pose span — never extrapolated
    assert(out(2L).isNullAt(out(2L).fieldIndex("ego_speed_mps")))

    // clips: frame 0 nearest = clip 41 (100 ms before, offset +100 ms);
    // frame 1 nearest = clip 42 (300 ms after, offset -300 ms);
    // frame 2 is > 2 s from any clip -> NULL
    assert(out(0L).getAs[Long]("clip_id") === 41L)
    assert(out(0L).getAs[Long]("clip_offset_ns") === 100000000L)
    assert(out(1L).getAs[Long]("clip_id") === 42L)
    assert(out(1L).getAs[Long]("clip_offset_ns") === -300000000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("clip_id")))

    // detections: frame 0 rolled up, others read zero with NULL conf
    assert(out(0L).getAs[Long]("n_detections") === 2L)
    assert(math.abs(out(0L).getAs[Double]("max_conf") - 0.9) < E)
    assert(out(0L).getAs[Seq[String]]("labels") === Seq("car", "person"))
    assert(out(1L).getAs[Long]("n_detections") === 0L)
    assert(out(1L).isNullAt(out(1L).fieldIndex("max_conf")))
  }

  test("clip tie at equal distance goes to the EARLIER clip; bags never cross") {
    val f = frames(("b1", "/cam", 5 * S, 0L), ("b2", "/cam", 5 * S, 0L))
    val c = clips(("b1", 4 * S, 1L), ("b1", 6 * S, 2L), ("b2", 5 * S, 3L))
    val o = odom(("b1", 0L, 0.0, 0.0, 0.0), ("b1", 10 * S, 10.0, 0.0, 0.0),
      ("b2", 0L, 0.0, 0.0, 0.0), ("b2", 10 * S, 0.0, 0.0, 0.0))
    val out = SampleAssembly.assembleOf(f, c, o, None, clipTolNs = 2 * S)
      .collect().map(r => r.getAs[String]("bag") -> r).toMap
    assert(out("b1").getAs[Long]("clip_id") === 1L) // tie -> earlier
    assert(out("b2").getAs[Long]("clip_id") === 3L) // its own bag's clip
    // stationary b2 reads speed 0 exactly; moving b1 reads 1 m/s
    assert(math.abs(out("b1").getAs[Double]("ego_speed_mps") - 1.0) < E)
    assert(math.abs(out("b2").getAs[Double]("ego_speed_mps")) < E)
  }

  test("end-to-end from a landed lake: BagIngest then assemble") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graftasm")
    val pixels = Array.tabulate[Byte](4 * 2 * 3)(i => (i * 7).toByte)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        BagWriter.message(0, 1600000001L, 0, BagWriter.imagePayload(0, 4, 2, "rgb8", pixels)) ++
        BagWriter.connection(1, "/odom", "nav_msgs/Odometry") ++
        BagWriter.message(1, 1600000000L, 0, BagWriter.odometryPayload(0.0, 1.0)) ++
        BagWriter.message(1, 1600000002L, 0, BagWriter.odometryPayload(6.0, 1.0))
    val bagDir = dir.resolve("bags"); Files.createDirectories(bagDir)
    Files.write(bagDir.resolve("a.bag"),
      BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    val lake = dir.resolve("lake").toString
    graft.jobs.BagIngest.run(spark, bagDir.toString, lake, writePng = false)
    val outDir = dir.resolve("samples").toString
    SampleAssembly.assemble(spark, lake, outDir)
    val rows = spark.read.parquet(s"$outDir/samples").collect()
    assert(rows.length === 1)
    val s = rows.head
    // frame at t=1s inside the 0..2 s pose span moving 6 m -> 3 m/s
    assert(math.abs(s.getAs[Double]("ego_speed_mps") - 3.0) < E)
    // no microphone in this bag: clip columns NULL, not an error
    assert(s.isNullAt(s.fieldIndex("clip_id")))
  }
}
