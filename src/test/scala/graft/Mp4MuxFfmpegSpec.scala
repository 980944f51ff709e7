package graft

import java.nio.file.Files

import graft.sources.rosbag.RosbagReader

/** The REAL ffmpeg execution path of Mp4Mux (its default command) —
  * environment-gated BOTH ways so no environment green-washes it:
  *
  *  - where an `ffmpeg` binary exists, mux() must produce a parseable mp4
  *    (the case `assume`s ffmpeg and is CANCELED, not passed, elsewhere);
  *  - where it does not, the first-run probe must fail fast with the
  *    actionable deployment-prerequisite message (the case `assume`s the
  *    absence, so ffmpeg-equipped environments cancel it instead).
  *
  * Every environment therefore exercises exactly one of the two exec
  * paths, and the probe's error contract is additionally pinned
  * unconditionally against a binary name that exists nowhere.
  */
class Mp4MuxFfmpegSpec extends SparkSpec {

  private lazy val ffmpegPresent: Boolean =
    try {
      val p = new ProcessBuilder("ffmpeg", "-version").redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** 4-frame 2x2 rgb8 bag — EVEN dims: libx264's yuv420p output subsamples
    * chroma 2x2, so odd frame sizes are rejected by the real encoder. */
  private lazy val bagPath: String = {
    val dir = Files.createTempDirectory("ffmbag")
    val px = Array[Byte](10, 20, 30, 50, 60, 70, 90, 100, 110, -126, -116, -106)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        (0 until 4).map(i => BagWriter.message(0, 1600000000L + i, 0,
          BagWriter.imagePayload(i, 2, 2, "rgb8", px))).reduce(_ ++ _)
    val f = dir.resolve("ffm.bag")
    Files.write(f, BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    f.toString
  }

  test("mux() runs the real ffmpeg command and writes a parseable mp4") {
    assume(ffmpegPresent, "no ffmpeg on PATH — runs in ffmpeg-equipped environments")
    val out = Files.createTempDirectory("ffmout").toString
    graft.jobs.Mp4Mux.mux(spark, RosbagReader.images(spark, bagPath), out)
    val made = new java.io.File(out).listFiles().filter(_.getName.endsWith(".mp4"))
    assert(made.length === 1)
    assert(made(0).getName === "ffm.bag__cam0_image_raw.mp4")
    val bytes = Files.readAllBytes(made(0).toPath)
    // ISO-BMFF: a well-formed mp4 leads with an ftyp box at byte offset 4
    assert(bytes.length > 100)
    assert(new String(bytes.slice(4, 8), "US-ASCII") === "ftyp")
  }

  test("missing ffmpeg fails fast with the deployment-prerequisite message") {
    assume(!ffmpegPresent, "ffmpeg IS on PATH — the missing-binary path cannot run here")
    val out = Files.createTempDirectory("ffmmiss").toString
    val e = intercept[Exception] {
      graft.jobs.Mp4Mux.mux(spark, RosbagReader.images(spark, bagPath), out)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("ffmpeg"), s"probe message lost: $msgs")
    assert(msgs.contains("EXECUTOR's PATH"), s"prerequisite not named: $msgs")
    // fail-fast: the probe fired before any recording staged an mp4
    assert(new java.io.File(out).listFiles().forall(!_.getName.endsWith(".mp4")))
  }

  test("probeMuxer names the binary and the prerequisite in its error") {
    val e = intercept[IllegalArgumentException] {
      graft.jobs.Mp4Mux.probeMuxer("graft-no-such-muxer-binary")
    }
    assert(e.getMessage.contains("graft-no-such-muxer-binary"))
    assert(e.getMessage.contains("-version"))
    assert(e.getMessage.contains("EXECUTOR"))
  }
}
