package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files
import java.util.zip.{CRC32, Inflater}

import graft.multimodal.{ImageOps, PngEncoder}
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
