package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files
import java.util.zip.{CRC32, Inflater}

import graft.multimodal.{ImageOps, PngDecoder, PngEncoder}
import graft.sources.rosbag.RosbagReader

/** Validates PNG output with an independent decode path (java.util.zip
  * Inflater + chunk walk), not the encoder's own logic.
  */
class PngSpec extends SparkSpec {

  private def decode(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    assert(png.slice(0, 8).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte), "bad signature")
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    val idat = new ByteArrayOutputStream()
    while (pos < png.length) {
      val len = ByteBuffer.wrap(png, pos, 4).getInt
      val typ = new String(png, pos + 4, 4, "ASCII")
      val data = java.util.Arrays.copyOfRange(png, pos + 8, pos + 8 + len)
      val crc = new CRC32()
      crc.update(png, pos + 4, 4 + len)
      val stored = ByteBuffer.wrap(png, pos + 8 + len, 4).getInt
      assert(crc.getValue.toInt === stored, s"bad CRC for $typ")
      typ match {
        case "IHDR" =>
          val b = ByteBuffer.wrap(data)
          width = b.getInt; height = b.getInt
          assert(b.get() === 8, "bit depth")
          colorType = b.get()
        case "IDAT" => idat.write(data)
        case _      =>
      }
      pos += 12 + len
    }
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val channels = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val raw = new Array[Byte](height * (width * channels + 1))
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      off += inflater.inflate(raw, off, raw.length - off)
    }
    inflater.end()
    val stride = width * channels
    val pixels = new Array[Byte](height * stride)
    (0 until height).foreach { y =>
      assert(raw(y * (stride + 1)) === 0, "filter byte")
      System.arraycopy(raw, y * (stride + 1) + 1, pixels, y * stride, stride)
    }
    (width, height, colorType, pixels)
  }

  test("encode: rgb8 roundtrip via independent inflate") {
    val px = Array.tabulate[Byte](4 * 2 * 3)(i => (i * 7).toByte)
    val png = PngEncoder.encode(px, 4, 2, "rgb8")
    val (w, h, ct, out) = decode(png)
    assert(w === 4 && h === 2 && ct === 2)
    assert(out.toSeq === px.toSeq)
  }

  test("encode: 8UC3 swaps BGR to RGB") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6) // two BGR pixels
    val (_, _, _, out) = decode(PngEncoder.encode(px, 2, 1, "8UC3"))
    assert(out.toSeq === Seq[Byte](3, 2, 1, 6, 5, 4))
  }

  test("encode: padded row stride (ROS step) is skipped, not baked in") {
    // width=2 rgb8 (6 row bytes) with step=8: 2 padding bytes per row
    val px = Array[Byte](
      1, 2, 3, 4, 5, 6, 99, 99,
      7, 8, 9, 10, 11, 12, 99, 99)
    val (w, h, _, out) = decode(PngEncoder.encode(px, 2, 2, "rgb8", srcStride = 8))
    assert(w === 2 && h === 2)
    assert(out.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("encode: mono8 and rgba8 layouts") {
    val gray = Array[Byte](9, 8, 7, 6)
    val (_, _, ct0, g) = decode(PngEncoder.encode(gray, 2, 2, "mono8"))
    assert(ct0 === 0 && g.toSeq === gray.toSeq)
    val rgba = Array.tabulate[Byte](8)(_.toByte)
    val (_, _, ct6, a) = decode(PngEncoder.encode(rgba, 2, 1, "rgba8"))
    assert(ct6 === 6 && a.toSeq === rgba.toSeq)
  }

  test("PngDecoder: decode(encode(px)) is bit-exact for mono8/rgb8/rgba8") {
    val rgb = Array.tabulate[Byte](5 * 3 * 3)(i => (i * 11 + 3).toByte)
    val dRgb = PngDecoder.decode(PngEncoder.encode(rgb, 5, 3, "rgb8"))
    assert(dRgb.width === 5 && dRgb.height === 3 && dRgb.encoding === "rgb8")
    assert(dRgb.step === 15 && dRgb.pixels.toSeq === rgb.toSeq)

    val gray = Array.tabulate[Byte](6 * 4)(i => (255 - i).toByte)
    val dGray = PngDecoder.decode(PngEncoder.encode(gray, 6, 4, "mono8"))
    assert(dGray.encoding === "mono8" && dGray.pixels.toSeq === gray.toSeq)

    val rgba = Array.tabulate[Byte](3 * 2 * 4)(i => (i * 37).toByte)
    val dRgba = PngDecoder.decode(PngEncoder.encode(rgba, 3, 2, "rgba8"))
    assert(dRgba.encoding === "rgba8" && dRgba.pixels.toSeq === rgba.toSeq)

    // BGR sources were swapped to RGB at encode time: decode yields rgb8
    val bgr = Array[Byte](1, 2, 3, 4, 5, 6)
    val dBgr = PngDecoder.decode(PngEncoder.encode(bgr, 2, 1, "bgr8"))
    assert(dBgr.encoding === "rgb8" && dBgr.pixels.toSeq === Seq[Byte](3, 2, 1, 6, 5, 4))

    // padded source stride decodes to a TIGHT buffer of the same content
    val padded = Array[Byte](1, 2, 3, 4, 5, 6, 99, 99, 7, 8, 9, 10, 11, 12, 99, 99)
    val dPad = PngDecoder.decode(PngEncoder.encode(padded, 2, 2, "rgb8", srcStride = 8))
    assert(dPad.step === 6 &&
      dPad.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))

    intercept[IllegalArgumentException] { PngDecoder.decode(Array[Byte](9, 9, 9, 9)) }
  }

  test("blur on a decoded lake PNG == blur on the original raw frame") {
    import spark.implicits._
    val w = 16; val h = 8
    val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 31 + 7) % 251).toByte)
    val frames = Seq(ImageOps.Frame("b", "/cam0", 1L, w, h, "rgb8", w * 3, px)).toDF()
    val regions = Seq(("b", "/cam0", 1L, 4, 2, 6, 4)).toDF(
      "bag", "topic", "time_ns", "region_x", "region_y", "region_w", "region_h")
    val onRaw = ImageOps.blurFrames(spark, frames, regions, sigma = 2.0, margin = 1)
      .select("pixels").collect()(0).getAs[Array[Byte]](0)

    // land the frame as a PNG, decode it back, blur the decoded frame
    val png = PngEncoder.encode(px, w, h, "rgb8")
    val lake = Seq(("b", "/cam0", 1L, png)).toDF("bag", "topic", "time_ns", "png")
    val decoded = ImageOps.decodePng(spark, lake)
    val onDecoded = ImageOps.blurFrames(spark, decoded, regions, sigma = 2.0, margin = 1)
      .select("pixels").collect()(0).getAs[Array[Byte]](0)
    assert(onDecoded.toSeq === onRaw.toSeq)
  }

  test("reingestPngs: a landed PNG lake round-trips to the original raw frames") {
    val dir = Files.createTempDirectory("reingest")
    val px0 = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 5).toByte)
    val px1 = Array.tabulate[Byte](4 * 3 * 3)(i => (200 - i * 3).toByte)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        BagWriter.message(0, 1600000000L, 0, BagWriter.imagePayload(0, 4, 3, "rgb8", px0)) ++
        BagWriter.message(0, 1600000001L, 0, BagWriter.imagePayload(1, 4, 3, "rgb8", px1))
    val f = dir.resolve("r.bag")
    Files.write(f, BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    val out = Files.createTempDirectory("reingestout").toString
    graft.jobs.BagIngest.run(spark, f.toString, out, writePng = true)
    val manifest = spark.read.parquet(s"$out/manifest")

    val frames = ImageOps.reingestPngs(spark, s"$out/png", manifest)
    val got = frames.select("frame_no", "width", "height", "encoding", "pixels")
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]]("pixels").toSeq,
        r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(got.length === 2)
    assert(got(0)._2 === px0.toSeq && got(1)._2 === px1.toSeq)
    assert(got.forall(g => g._3 === 4L && g._4 === 3L && g._5 === "rgb8"))
    // decoded frames feed the pixel pipeline directly: re-encode round-trips
    val repng = ImageOps.toPng(spark,
      frames.withColumn("time_ns", org.apache.spark.sql.functions.col("frame_no").cast("long")))
      .collect().sortBy(_.time_ns)
    assert(decode(repng(0).png)._4.toSeq === px0.toSeq)
  }

  test("PngAudit decode-verify flags undecodable files as corrupt") {
    val dir = Files.createTempDirectory("auditcorrupt")
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => i.toByte)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        BagWriter.message(0, 1600000000L, 0, BagWriter.imagePayload(0, 2, 2, "rgb8", px))
    val f = dir.resolve("c.bag")
    Files.write(f, BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    val out = Files.createTempDirectory("auditcorruptout").toString
    graft.jobs.BagIngest.run(spark, f.toString, out, writePng = true)
    val manifest = spark.read.parquet(s"$out/manifest")

    // clean lake: decode-verify adds no findings
    assert(graft.jobs.PngAudit.audit(spark, manifest, s"$out/png", verifyDecode = true)
      .count() === 0)
    // clobber a manifest-listed PNG with junk (the half-uploaded-file
    // failure mode): still listed, no longer decodable
    import scala.jdk.CollectionConverters._
    val victim = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/png"))
      .iterator().asScala.find(_.toString.endsWith(".png")).get
    java.nio.file.Files.write(victim, Array[Byte](0x42, 0x41, 0x44, 0x21))
    val findings = graft.jobs.PngAudit
      .audit(spark, manifest, s"$out/png", verifyDecode = true).collect()
    assert(findings.map(_.getString(0)).toSeq === Seq("corrupt"))
    // metadata-only audit stays blind to it — the mode exists for a reason
    assert(graft.jobs.PngAudit.audit(spark, manifest, s"$out/png").count() === 0)
  }

  test("toPng(): distributed encode over bag frames") {
    val dir = Files.createTempDirectory("pngbag")
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => i.toByte)
    val inner =
      BagWriter.connection(0, "/cam0/image_raw", "sensor_msgs/Image") ++
        BagWriter.message(0, 1600000000L, 0, BagWriter.imagePayload(0, 2, 2, "rgb8", px))
    val f = dir.resolve("p.bag")
    Files.write(f, BagWriter.bag(BagWriter.bagHeader, BagWriter.chunk(inner, bz2 = false)))
    val frames = RosbagReader.images(spark, f.toString)
    val pngs = ImageOps.toPng(spark, frames).collect()
    assert(pngs.length === 1)
    assert(pngs(0).file_name.endsWith(".png"))
    val (w, h, _, out) = decode(pngs(0).png)
    assert(w === 2 && h === 2 && out.toSeq === px.toSeq)
  }
}
