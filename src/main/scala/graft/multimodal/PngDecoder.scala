package graft.multimodal

import java.awt.image.IndexColorModel
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Compressed-image decode via the JDK's `javax.imageio` — dependency-free,
  * so executors can decode with no native codec installed. This closes the
  * re-ingest gap: a lake of already-landed PNGs can be decoded back to the
  * raw channels-last uint8 buffers the pixel kernels (blur/resize/crop)
  * operate on, the flow the reference runs with PIL `Image.open`
  * (select-labelling-imgs.py:58-124: download → decode → blur → re-encode).
  *
  * Output convention matches the rosbag source and [[PngEncoder]]: 8-bit
  * channels-last, encoding ∈ {mono8, rgb8, rgba8}, tight row stride
  * (`step = width * channels`). BGR sources were already swapped to RGB at
  * encode time (bagstream.py:257), so a decoded lake frame is rgb8.
  * Decoding is LOSSLESS for PNG: `decode(encode(px)) == px` byte-for-byte.
  */
object PngDecoder {

  final case class Decoded(pixels: Array[Byte], width: Int, height: Int,
                           encoding: String, step: Int)

  /** Decode PNG (or any ImageIO-supported format) bytes to a raw frame.
    * Throws on undecodable bytes — re-ingest must not silently skip a
    * corrupt lake file (PngAudit's decode-verify mode reports them). */
  def decode(bytes: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes (no ImageIO reader claimed them)")
    val w = img.getWidth
    val h = img.getHeight
    val cm = img.getColorModel
    val raster = img.getRaster
    val nb = raster.getNumBands
    // exactly 8 bits per component: a sub-8-bit source (1/2/4-bit gray)
    // stores raw samples 0..(2^d-1), so emitting them as mono8 would decode
    // a white 1-bit pixel to 1 instead of 255 — those fall through to the
    // color-model-resolving general path, which scales correctly
    val plain8 = !cm.isInstanceOf[IndexColorModel] &&
      cm.getComponentSize.forall(_ == 8) && (nb == 1 || nb == 3 || nb == 4)
    if (plain8) {
      // fast path: samples are already 8-bit gray/RGB(A) in band order
      val encoding = nb match { case 1 => "mono8"; case 3 => "rgb8"; case _ => "rgba8" }
      val out = new Array[Byte](w * h * nb)
      val row = new Array[Int](w * nb)
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var i = 0
        val base = y * w * nb
        while (i < row.length) { out(base + i) = row(i).toByte; i += 1 }
        y += 1
      }
      Decoded(out, w, h, encoding, w * nb)
    } else {
      // general path (palette PNGs, 16-bit sources, exotic layouts): let
      // the color model resolve every pixel to sRGB — lossy to 8 bits by
      // construction, but never wrong about the color
      val hasAlpha = cm.hasAlpha
      val ch = if (hasAlpha) 4 else 3
      val out = new Array[Byte](w * h * ch)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val base = (y * w + x) * ch
          out(base) = ((argb >> 16) & 0xff).toByte
          out(base + 1) = ((argb >> 8) & 0xff).toByte
          out(base + 2) = (argb & 0xff).toByte
          if (hasAlpha) out(base + 3) = ((argb >> 24) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Decoded(out, w, h, if (hasAlpha) "rgba8" else "rgb8", w * ch)
    }
  }
}
