package graft.jobs

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.PngEncoder

/** Distributed mp4 muxing hook — the reference's per-recording
  * `ffmpeg -framerate N -i image_raw-%04d.png ... out.mp4` step
  * (service/app/main.py:59) as an executor-side sink.
  *
  * Each (bag, topic) recording is co-located in one task by a hash
  * repartition and arrives frame_no-ordered; the task streams the frames to
  * PNG files in a scratch directory (the exact layout ffmpeg's %04d input
  * pattern expects), computes the recording fps from the frame timestamps
  * (same formula as the mp4 manifest), runs the muxer command, and leaves
  * `<out>/<recording>.mp4`. The command is injectable because this
  * container ships no ffmpeg: production uses [[ffmpegCommand]] verbatim;
  * specs substitute a stand-in and assert the frame staging + invocation
  * contract.
  *
  * DEPLOYMENT PREREQUISITE: the default command requires `ffmpeg` on every
  * EXECUTOR's PATH (the muxer runs task-side, not on the driver) — same
  * binary the reference's container image installs. An ffmpeg-shaped
  * command is probed (`ffmpeg -version`, once per executor JVM) before the
  * first real invocation, so a deployment missing the binary fails
  * immediately with an actionable message. What is validated where: the
  * distributed staging contract (per-recording co-location, frame_no-
  * ordered %04d PNG layout, fps computation, per-recording invocation,
  * non-zero-exit propagation, scratch cleanup) is spec-tested via the
  * injectable stand-in; the real ffmpeg execution is covered by
  * Mp4MuxFfmpegSpec, whose mux-to-parseable-mp4 case runs wherever an
  * ffmpeg binary exists (environment-gated via assume, never
  * green-washed) and whose missing-binary case asserts the probe's
  * actionable failure everywhere else. The stand-in contract a substitute
  * command must honor: consume `<dir>/image_raw-%04d.png` (0-based),
  * write the given output path, exit 0 on success.
  */
object Mp4Mux {

  /** The reference's ffmpeg line (main.py:59): (stagingDir, fps, outFile). */
  def ffmpegCommand(dir: String, fps: Double, out: String): Seq[String] =
    Seq("ffmpeg", "-framerate", fps.toString, "-i", s"$dir/image_raw-%04d.png",
      "-c:v", "libx264", "-crf", "20", "-pix_fmt", "yuv420p", out)

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Muxer binaries already validated in this JVM (once per executor). */
  private val probedOk = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Validate-on-first-run probe: `<bin> -version` must execute and exit 0
    * BEFORE the first real invocation, so a deployment missing the binary
    * fails immediately with a message naming the prerequisite — not with a
    * per-recording exec error after frames were already staged, deep in a
    * task retry loop. Cached per JVM; ffmpeg-shaped commands only (a
    * custom stand-in need not support `-version`).
    */
  private[graft] def probeMuxer(bin: String): Unit =
    if (!probedOk.contains(bin)) {
      val ok =
        try {
          val p = new ProcessBuilder(bin, "-version").redirectErrorStream(true).start()
          p.getInputStream.readAllBytes()
          p.waitFor() == 0
        } catch { case _: java.io.IOException => false }
      require(ok,
        s"muxer '$bin' is not runnable on this executor ('$bin -version' failed). " +
          "Mp4Mux's default command needs ffmpeg installed on every EXECUTOR's PATH " +
          "(see README) — or inject a custom `command` to use a different muxer.")
      probedOk.add(bin)
    }

  /** Mux every (bag, topic) recording in `images` (the RosbagReader.images
    * schema) into `outDir`. One muxer invocation per recording, recordings
    * processed in parallel across tasks.
    */
  def mux(spark: SparkSession, images: DataFrame, outDir: String,
      command: (String, Double, String) => Seq[String] = ffmpegCommand): Unit = {
    new File(outDir).mkdirs()
    // ffmpeg-shaped command (the default, or a custom path to an ffmpeg
    // binary): probe it once per executor before muxing anything
    val muxerBin = command("<probe>", 1.0, "<probe>").headOption.getOrElse("")
    val probeBin = if (new File(muxerBin).getName == "ffmpeg") Some(muxerBin) else None
    images
      .select("bag", "topic", "time_ns", "frame_no", "width", "height", "encoding", "step", "pixels")
      .repartition(col("bag"), col("topic"))
      .sortWithinPartitions("bag", "topic", "frame_no")
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        probeBin.foreach(probeMuxer)
        var key: (String, String) = null
        var dir: File = null
        var n = 0L; var tMin = Long.MaxValue; var tMax = Long.MinValue

        def finish(): Unit = if (dir != null && n > 0) {
          val durS = (tMax - tMin) / 1e9
          val fps = if (durS > 0) (n - 1) / durS else 1.0
          val out = new File(outDir, s"${sanitize(key._1)}__${sanitize(key._2)}.mp4")
          val cmd = command(dir.getPath, fps, out.getPath)
          val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
          val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
          require(p.waitFor() == 0, s"muxer failed for ${key._1}/${key._2}: $cmd\n$log")
          dir.listFiles().foreach(_.delete()); dir.delete()
        }

        it.foreach { r =>
          val k = (r.getAs[String]("bag"), r.getAs[String]("topic"))
          if (k != key) { // frames arrive grouped: sorted by (bag, topic, frame_no)
            finish()
            key = k
            dir = Files.createTempDirectory("mux").toFile
            n = 0; tMin = Long.MaxValue; tMax = Long.MinValue
          }
          val png = PngEncoder.encode(r.getAs[Array[Byte]]("pixels"),
            r.getAs[Long]("width").toInt, r.getAs[Long]("height").toInt,
            r.getAs[String]("encoding"), r.getAs[Long]("step").toInt)
          // staged by a per-recording RUNNING counter, not frame_no: ffmpeg's
          // %04d reader stops at the first numbering gap, so sampled/filtered
          // inputs (sparse frame_no) would silently truncate the video
          Files.write(new File(dir, f"image_raw-$n%04d.png").toPath, png)
          val t = r.getAs[Long]("time_ns")
          if (t < tMin) tMin = t
          if (t > tMax) tMax = t
          n += 1
        }
        finish()
      }
  }
}
