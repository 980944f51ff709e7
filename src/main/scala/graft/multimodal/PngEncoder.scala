package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

/** Minimal dependency-free PNG encoder (public PNG spec: signature +
  * IHDR/IDAT/IEND chunks, zlib scanlines with filter 0).
  *
  * This makes the reference's core artifact — one PNG per camera frame
  * (bagstream.py:264 `img.save`) — real on the JVM with zero native deps:
  * deterministic bytes, suitable for distributed emission from executor
  * tasks.
  */
object PngEncoder {

  /** channels + PNG color type per ROS image encoding
    * (bagstream.py:249 img_encodings). */
  private def layout(encoding: String): (Int, Int, Boolean) = encoding match {
    case "mono8"          => (1, 0, false)
    case "rgba8"          => (4, 6, false)
    case "8UC3" | "bgr8"  => (3, 2, true) // stored BGR: swap to RGB (bagstream.py:257)
    case _                => (3, 2, false) // rgb8
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode a channels-last uint8 buffer to PNG bytes. `srcStride` is the
    * source row stride in bytes (ROS Image `step`) — rows may carry
    * alignment padding beyond width*channels, which is skipped here.
    */
  def encode(pixels: Array[Byte], width: Int, height: Int, encoding: String,
      srcStride: Int = -1): Array[Byte] = {
    val (channels, colorType, swapBgr) = layout(encoding)
    val srcRow = if (srcStride > 0) srcStride else width * channels
    require(srcRow >= width * channels, s"step $srcRow < row bytes ${width * channels}")
    val needed = if (height <= 0) 0 else (height - 1) * srcRow + width * channels
    require(pixels.length >= needed, s"pixel buffer too small: ${pixels.length} < $needed")

    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))

    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk(out, "IHDR", ihdr)

    // scanlines: filter byte 0 + row bytes (BGR swapped to RGB if needed)
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      val rowStart = y * (stride + 1)
      raw(rowStart) = 0
      var x = 0
      while (x < stride) {
        val src = y * srcRow + x
        val v =
          if (!swapBgr) pixels(src)
          else (x % 3) match {
            case 0 => pixels(src + 2) // R <- B position
            case 2 => pixels(src - 2) // B <- R position
            case _ => pixels(src)
          }
        raw(rowStart + 1 + x) = v
        x += 1
      }
      y += 1
    }

    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val zBuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zBuf.write(tmp, 0, n)
    }
    deflater.end()
    chunk(out, "IDAT", zBuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
