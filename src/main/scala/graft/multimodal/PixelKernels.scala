package graft.multimodal

/** Pure JVM raster kernels over channels-last uint8 buffers — the pixel
  * math the reference does through Pillow, re-expressed as allocation-lean
  * array loops so it runs partition-parallel inside executor tasks with no
  * native codec dependency.
  *
  * Buffer convention (shared with ImageOps/PngEncoder): row-major,
  * channels-last, row stride `step` >= width*channels with alignment
  * padding beyond width*channels ignored.
  *
  * - Gaussian blur: three successive box blurs (the standard O(1)-per-pixel
  *   sliding-window approximation of a Gaussian; Pillow's own
  *   ImageFilter.GaussianBlur is the same boxes-of-ideal-width scheme).
  *   Matches the reference's PII anonymization blur,
  *   select-labelling-imgs.py:88-92.
  * - Bilinear resize: center-aligned sample mapping (the cv2/Pillow
  *   convention), replicate edges. Matches the reference's Pillow resize
  *   path.
  */
object PixelKernels {

  /** Box widths whose 3-fold convolution best approximates a Gaussian of
    * standard deviation `sigma` (W3C SVG filter-effects algorithm).
    */
  private[multimodal] def boxSizesForGauss(sigma: Double, n: Int = 3): Array[Int] = {
    val wIdeal = math.sqrt(12.0 * sigma * sigma / n + 1.0)
    var wl = math.floor(wIdeal).toInt
    if (wl % 2 == 0) wl -= 1
    val wu = wl + 2
    val mIdeal = (12.0 * sigma * sigma - n * wl * wl - 4.0 * n * wl - 3.0 * n) / (-4.0 * wl - 4.0)
    val m = math.round(mIdeal).toInt
    Array.tabulate(n)(i => if (i < m) wl else wu)
  }

  /** One horizontal box-blur pass with a sliding sum (O(1) per pixel,
    * independent of radius), replicate-edge policy. `src`/`dst` are tight
    * float planes of one channel, width x height.
    */
  private def boxBlurH(src: Array[Float], dst: Array[Float], w: Int, h: Int, r: Int): Unit = {
    val norm = 1.0f / (2 * r + 1)
    var y = 0
    while (y < h) {
      val row = y * w
      val first = src(row)
      val last = src(row + w - 1)
      var sum = first * (r + 1)
      var x = 0
      while (x < r && x < w) { sum += src(row + x); x += 1 }
      while (x < r) { sum += last; x += 1 } // image narrower than radius
      x = 0
      while (x < w) {
        val in = if (x + r < w) src(row + x + r) else last
        val out = if (x - r - 1 >= 0) src(row + x - r - 1) else first
        sum += in - out
        dst(row + x) = sum * norm
        x += 1
      }
      y += 1
    }
  }

  /** Vertical counterpart of [[boxBlurH]]. */
  private def boxBlurV(src: Array[Float], dst: Array[Float], w: Int, h: Int, r: Int): Unit = {
    val norm = 1.0f / (2 * r + 1)
    var x = 0
    while (x < w) {
      val first = src(x)
      val last = src((h - 1) * w + x)
      var sum = first * (r + 1)
      var y = 0
      while (y < r && y < h) { sum += src(y * w + x); y += 1 }
      while (y < r) { sum += last; y += 1 }
      y = 0
      while (y < h) {
        val in = if (y + r < h) src((y + r) * w + x) else last
        val out = if (y - r - 1 >= 0) src((y - r - 1) * w + x) else first
        sum += in - out
        dst(y * w + x) = sum * norm
        y += 1
      }
      x += 1
    }
  }

  /** Gaussian-blur the whole frame (all channels), returning a TIGHT
    * width*channels-stride buffer. A constant image blurs to itself
    * (replicate edges keep the kernel weight sum at 1).
    */
  def gaussianBlur(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int, sigma: Double): Array[Byte] = {
    val stride = if (step >= width * channels) step else width * channels
    val radii = boxSizesForGauss(sigma).map(s => (s - 1) / 2)
    val out = new Array[Byte](width * height * channels)
    val a = new Array[Float](width * height)
    val b = new Array[Float](width * height)
    var c = 0
    while (c < channels) {
      // de-interleave one channel into a tight float plane
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          a(y * width + x) = (pixels(y * stride + x * channels + c) & 0xff).toFloat
          x += 1
        }
        y += 1
      }
      radii.foreach { r =>
        boxBlurH(a, b, width, height, r)
        boxBlurV(b, a, width, height, r)
      }
      var i = 0
      while (i < width * height) {
        val v = math.round(a(i))
        out(i * channels + c) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        i += 1
      }
      c += 1
    }
    out
  }

  /** Blur only the given regions: Gaussian-blur the frame, then composite
    * the blurred pixels back INSIDE the (already padded+clamped) boxes and
    * keep every byte outside them bit-identical — exactly the reference's
    * mask-paste composition (select-labelling-imgs.py:88-92: rectangle mask,
    * full-image GaussianBlur, `image.paste(blurred, mask=mask)`). Box
    * bounds are [x1, x2) x [y1, y2) in pixels.
    *
    * With several boxes the reference re-blurs the partially-composited
    * image before each paste; this kernel composites every box from ONE
    * blur of the original. Byte-identical to the reference only when boxes
    * are separated by more than the kernel support (~3*sigma); closer or
    * overlapping boxes differ by a second-order smoothing of
    * already-anonymized pixels — anonymization strength is never reduced.
    */
  def blurRegions(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int, boxes: Seq[(Int, Int, Int, Int)], sigma: Double): Array[Byte] = {
    if (boxes.isEmpty) return pixels
    val stride = if (step >= width * channels) step else width * channels
    val blurred = gaussianBlur(pixels, width, height, channels, step, sigma)
    val out = pixels.clone()
    boxes.foreach { case (bx1, by1, bx2, by2) =>
      val x1 = math.max(0, bx1); val y1 = math.max(0, by1)
      val x2 = math.min(width, bx2); val y2 = math.min(height, by2)
      var y = y1
      while (y < y2) {
        var x = x1
        while (x < x2) {
          var c = 0
          while (c < channels) {
            out(y * stride + x * channels + c) = blurred((y * width + x) * channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Bilinear resize to (tw, th), center-aligned sample grid
    * (src = (dst + 0.5) * scale - 0.5, the cv2/Pillow convention), edges
    * clamped. Returns a TIGHT tw*channels-stride buffer.
    */
  def resizeBilinear(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int, tw: Int, th: Int): Array[Byte] = {
    val stride = if (step >= width * channels) step else width * channels
    val out = new Array[Byte](tw * th * channels)
    val sx = width.toDouble / tw
    val sy = height.toDouble / th
    var dy = 0
    while (dy < th) {
      val fy = (dy + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(height - 1, math.floor(fy).toInt))
      val y1 = math.min(height - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var dx = 0
      while (dx < tw) {
        val fx = (dx + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(width - 1, math.floor(fx).toInt))
        val x1 = math.min(width - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        var c = 0
        while (c < channels) {
          val p00 = pixels(y0 * stride + x0 * channels + c) & 0xff
          val p01 = pixels(y0 * stride + x1 * channels + c) & 0xff
          val p10 = pixels(y1 * stride + x0 * channels + c) & 0xff
          val p11 = pixels(y1 * stride + x1 * channels + c) & 0xff
          val v = (p00 * (1 - wx) + p01 * wx) * (1 - wy) + (p10 * (1 - wx) + p11 * wx) * wy
          val r = math.round(v).toInt
          out((dy * tw + dx) * channels + c) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          c += 1
        }
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** Grayscale reduction to a tight 1-channel buffer: the ITU-R BT.601
    * luma weights in EXACT integer arithmetic —
    * (299·R + 587·G + 114·B + 500) / 1000 — so the value is
    * engine/platform-reproducible (no float rounding drift between runs).
    * mono8 passes through (stride stripped); rgba8's alpha is ignored;
    * bgr8/8UC3 note: luma weights are applied in buffer order (R↔B swap
    * changes luma slightly but near-dup hashing only needs a DETERMINISTIC
    * projection, not a colorimetric one — same policy as channelsForStats).
    */
  def grayscale(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int): Array[Byte] = {
    val stride = if (step >= width * channels) step else width * channels
    val out = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = y * stride + x * channels
        val g =
          if (channels == 1) pixels(p) & 0xff
          else {
            val r = pixels(p) & 0xff
            val gg = pixels(p + 1) & 0xff
            val b = pixels(p + 2) & 0xff
            (299 * r + 587 * gg + 114 * b + 500) / 1000
          }
        out(y * width + x) = g.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** dHash — the difference perceptual hash (the standard 64-bit image
    * near-dup fingerprint: grayscale → 9×8 downsample → bit per
    * horizontal-neighbor gradient sign). Robust to re-encoding, mild
    * noise, and uniform brightness shifts; one bit flips per local
    * gradient-sign change, so near-duplicate frames land within a small
    * Hamming distance. Bit (y·8 + x) is set iff g[y][x+1] > g[y][x].
    */
  def dhash(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int): Long = {
    val gray = grayscale(pixels, width, height, channels, step)
    val small = resizeBilinear(gray, width, height, 1, width, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val a = small(y * 9 + x) & 0xff
        val b = small(y * 9 + x + 1) & 0xff
        if (b > a) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Crop the [x1, x2) × [y1, y2) window to a tight buffer (stride =
    * width × channels, no alignment padding) — one System.arraycopy per
    * row. Bounds must be pre-clamped to the frame.
    */
  def crop(pixels: Array[Byte], width: Int, height: Int, channels: Int,
      step: Int, x1: Int, y1: Int, x2: Int, y2: Int): Array[Byte] = {
    require(0 <= x1 && x1 < x2 && x2 <= width && 0 <= y1 && y1 < y2 && y2 <= height,
      s"crop [$x1,$y1,$x2,$y2) outside ${width}x$height")
    val stride = if (step >= width * channels) step else width * channels
    val cw = (x2 - x1) * channels
    val out = new Array[Byte]((y2 - y1) * cw)
    var y = y1
    while (y < y2) {
      System.arraycopy(pixels, y * stride + x1 * channels, out, (y - y1) * cw, cw)
      y += 1
    }
    out
  }
}
