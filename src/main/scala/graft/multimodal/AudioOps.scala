package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{array, bit_count, col, explode}

/** Audio-column operators — the audio leg of the multimodal design
  * (SURVEY.md §2 `multimodal`): clips travel as opaque `binary` columns of
  * PCM16LE samples with typed metadata (sample_rate, channels), and every
  * op is real sample math running partition-parallel, mirroring
  * ImageOps/PixelKernels. PCM needs no codec, so nothing here is stubbed;
  * only compressed audio (mp3/flac) decode would need a library.
  */
object AudioOps {

  final case class Clip(clip_id: Long, sample_rate: Int, channels: Int, pcm: Array[Byte])

  final case class ClipFeatures(clip_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, duration_s: Double, rms: Double, peak: Double, zero_cross_rate: Double)

  /** Decode one PCM16LE interleaved frame stream to per-sample mono floats
    * in [-1, 1] (channel-averaged — the standard mono mixdown).
    */
  private[multimodal] def toMono(pcm: Array[Byte], channels: Int): Array[Float] = {
    val frames = pcm.length / (2 * channels)
    val out = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val i = (f * channels + c) * 2
        val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
        acc += s / 32768.0f
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    out
  }

  /** Per-clip signal statistics (the feature-extraction stage): RMS energy,
    * peak amplitude, zero-crossing rate — the cheap quality/VAD features a
    * training-data pipeline filters on. One batch of clips per task.
    */
  def features(spark: SparkSession, clips: DataFrame): Dataset[ClipFeatures] = {
    import spark.implicits._
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .mapPartitions(_.map { c =>
        val mono = toMono(c.pcm, c.channels)
        var sumSq = 0.0; var peak = 0.0; var crossings = 0L
        var i = 0
        while (i < mono.length) {
          val v = mono(i)
          sumSq += v.toDouble * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && (mono(i - 1) >= 0) != (v >= 0)) crossings += 1
          i += 1
        }
        val n = mono.length.toLong
        ClipFeatures(c.clip_id, c.sample_rate, c.channels, n,
          n.toDouble / c.sample_rate,
          if (n > 0) math.sqrt(sumSq / n) else 0.0, peak,
          if (n > 1) crossings.toDouble / (n - 1) else 0.0)
      })
  }

  /** Linear-interpolation resample of a mono float signal (the audio analog
    * of the bilinear image resample; center-aligned, edges clamped).
    */
  private[graft] def resampleLinear(mono: Array[Float], from: Int, to: Int): Array[Float] = {
    if (from == to) return mono
    val n = math.max(1, math.round(mono.length.toLong * to.toDouble / from).toInt)
    val out = new Array[Float](n)
    val scale = mono.length.toDouble / n
    var i = 0
    while (i < n) {
      val pos = (i + 0.5) * scale - 0.5
      val p0 = math.max(0, math.min(mono.length - 1, math.floor(pos).toInt))
      val p1 = math.min(mono.length - 1, p0 + 1)
      val frac = math.max(0.0, math.min(1.0, pos - p0))
      out(i) = (mono(p0) * (1 - frac) + mono(p1) * frac).toFloat
      i += 1
    }
    out
  }

  /** Resample every clip to `targetRate` (mono PCM16LE out) — the
    * normalize-the-corpus step before feature extraction or training.
    * Schema mirrors the input; clips already at the target rate pass
    * through as mono without interpolation.
    */
  def resample(spark: SparkSession, clips: DataFrame, targetRate: Int): Dataset[Clip] = {
    import spark.implicits._
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .mapPartitions(_.map { c =>
        val mono = resampleLinear(toMono(c.pcm, c.channels), c.sample_rate, targetRate)
        val pcm = new Array[Byte](mono.length * 2)
        var i = 0
        while (i < mono.length) {
          val s = math.max(-32768, math.min(32767, math.round(mono(i) * 32768.0f))).toShort
          pcm(i * 2) = (s & 0xff).toByte
          pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        Clip(c.clip_id, targetRate, 1, pcm)
      })
  }

  // ---------- spectral features (round 13) ----------

  /** DFT twiddle tables for an N-sample window: C(a) = cos(2πa/N),
    * S(a) = sin(2πa/N) for a ∈ [0, N). For N ∈ {1, 2, 4, 8} the values
    * are EXACT IEEE doubles ({0, ±1, ±sqrt(0.5)} — sqrt is correctly
    * rounded by the IEEE 754 contract in every engine), which is what
    * lets the q105 driver arm oracle bit-exactly against DuckDB; general
    * N uses Math.cos/sin (engine-local — spec-pinned against a naive
    * recompute, not oracled). ONE table per window size, shared by every
    * bin (the direct DFT reads C[(m·t) mod N]).
    */
  private[graft] def twiddles(n: Int): (Array[Double], Array[Double]) = {
    require(n >= 1, s"window must be >= 1; got $n")
    val r = math.sqrt(0.5)
    if (n == 8)
      (Array(1.0, r, 0.0, -r, -1.0, -r, 0.0, r),
        Array(0.0, r, 1.0, r, 0.0, -r, -1.0, -r))
    else if (n == 4) (Array(1.0, 0.0, -1.0, 0.0), Array(0.0, 1.0, 0.0, -1.0))
    else if (n == 2) (Array(1.0, -1.0), Array(0.0, 0.0))
    else if (n == 1) (Array(1.0), Array(0.0))
    else (Array.tabulate(n)(a => Math.cos(2.0 * Math.PI * a / n)),
      Array.tabulate(n)(a => Math.sin(2.0 * Math.PI * a / n)))
  }

  /** Direct DFT power spectrum of ONE window: P(m) = re² + im² for
    * m ∈ [0, N/2], re = Σ_t v_t·C[(m·t) mod N] (ascending-t IEEE fold —
    * the graft_dot order, so the DuckDB list_reduce replays it
    * bit-exactly). O(N²) per window — the verdict's "direct O(n·k) on
    * bounded windows" trade: windows are 8–2048 samples, no FFT
    * dependency, and the pass is embarrassingly window-parallel.
    */
  private[graft] def dftPower(v: Array[Double], off: Int, n: Int,
      cos: Array[Double], sin: Array[Double]): Array[Double] = {
    val out = new Array[Double](n / 2 + 1)
    var m = 0
    while (m <= n / 2) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val a = (m * t) % n
        val s = v(off + t)
        re += s * cos(a)
        im += s * sin(a)
        t += 1
      }
      out(m) = re * re + im * im
      m += 1
    }
    out
  }

  /** HTK mel scale: mel(f) = 2595·log10(1 + f/700). */
  private def mel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  private def melInv(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank energies over a window's power spectrum
    * (the standard MFCC front half, log energies): `nMels` filters with
    * mel-equidistant peaks spanning [0, sampleRate/2]; filter weights
    * derive from the bin center frequencies m·rate/N. Returns
    * ln(max(E, 1e-12)) per filter — the floor keeps silent windows
    * finite. Engine-local transcendentals (log/pow) — spec-pinned, not
    * oracled.
    */
  private[graft] def melEnergies(power: Array[Double], n: Int,
      sampleRate: Int, nMels: Int): Array[Double] = {
    val melMax = mel(sampleRate / 2.0)
    // nMels triangles need nMels+2 mel-equidistant edge points
    val edges = Array.tabulate(nMels + 2)(i => melInv(melMax * i / (nMels + 1)))
    val out = new Array[Double](nMels)
    var f = 0
    while (f < nMels) {
      val lo = edges(f); val mid = edges(f + 1); val hi = edges(f + 2)
      var e = 0.0
      var b = 0
      while (b < power.length) {
        val freq = b.toDouble * sampleRate / n
        val w =
          if (freq <= lo || freq >= hi) 0.0
          else if (freq <= mid) (freq - lo) / (mid - lo)
          else (hi - freq) / (hi - mid)
        e += w * power(b)
        b += 1
      }
      out(f) = math.log(math.max(e, 1e-12))
      f += 1
    }
    out
  }

  /** DCT-II over the log mel energies — the second half of MFCC
    * (cepstral coefficients decorrelate the overlapping filterbank):
    * c_k = Σ_i x_i · cos(π·k·(i + ½)/M), k ∈ [0, nCoeffs). Engine-local
    * Math.cos (spec-pinned vs a naive recompute, like the filterbank). */
  private[graft] def dct2(x: Array[Double], nCoeffs: Int): Array[Double] = {
    val m = x.length
    Array.tabulate(nCoeffs) { k =>
      var acc = 0.0
      var i = 0
      while (i < m) { acc += x(i) * Math.cos(Math.PI * k * (i + 0.5) / m); i += 1 }
      acc
    }
  }

  final case class WindowSpectral(clip_id: Long, win_no: Int, sample_rate: Int,
      rms: Double, power: Array[Double], centroid: Double, mel: Array[Double],
      mfcc: Array[Double])

  /** Per-window spectral features — the speech/music/silence front-end a
    * multimodal training lake filters on: each clip's mono signal splits
    * into consecutive `window`-sample frames (trailing partial frame
    * dropped — training features want full windows), and each frame gets
    * its direct-DFT power spectrum (N/2+1 bins), RMS, the spectral
    * CENTROID over bins 1..N/2 (Σ m·P(m) / Σ P(m), DC excluded — the
    * brightness feature; 0 when the window is pure DC/silence),
    * `nMels` log mel-filterbank energies (nMels = 0 skips the
    * filterbank), and `nMfcc` cepstral coefficients ([[dct2]] of the log
    * mels — full MFCC; requires nMels > 0, nMfcc = 0 skips).
    *
    * Scale shape: one flatMap over the clip scan — per-clip work,
    * window-parallel rows out, no shuffle, no per-clip state beyond the
    * clip's own buffer (the ImageOps convention). O(window²) per window
    * by design (bounded windows, zero FFT dependency).
    */
  def spectral(spark: SparkSession, clips: DataFrame, window: Int,
      nMels: Int = 0, nMfcc: Int = 0): Dataset[WindowSpectral] = {
    import spark.implicits._
    require(window >= 2, s"window must be >= 2; got $window")
    require(nMels >= 0, s"nMels must be >= 0; got $nMels")
    require(nMfcc >= 0 && (nMfcc == 0 || nMels > 0),
      s"nMfcc ($nMfcc) needs a mel filterbank (nMels = $nMels)")
    require(nMfcc <= math.max(nMels, 0),
      s"nMfcc ($nMfcc) cannot exceed nMels ($nMels)")
    val (cosT, sinT) = twiddles(window)
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .flatMap { c =>
        val mono = toMono(c.pcm, c.channels)
        val nWin = mono.length / window
        (0 until nWin).iterator.map { w =>
          val off = w * window
          // float32 samples upcast once: every PCM16 value is an exact
          // dyadic rational, identical in float and double
          val v = new Array[Double](window)
          var i = 0
          while (i < window) { v(i) = mono(off + i).toDouble; i += 1 }
          val p = dftPower(v, 0, window, cosT, sinT)
          var sumSq = 0.0
          i = 0
          while (i < window) { sumSq += v(i) * v(i); i += 1 }
          var wp = 0.0; var tp = 0.0
          var m = 1
          while (m < p.length) { wp += m * p(m); tp += p(m); m += 1 }
          val mels =
            if (nMels > 0) melEnergies(p, window, c.sample_rate, nMels)
            else Array.empty[Double]
          WindowSpectral(c.clip_id, w, c.sample_rate,
            math.sqrt(sumSq / window), p,
            if (tp > 0.0) wp / tp else 0.0,
            mels,
            if (nMfcc > 0) dct2(mels, nMfcc) else Array.empty[Double])
        }
      }
  }

  /** Trim leading and trailing SILENCE: split the mono signal into
    * `window`-sample frames, find the first and last frame whose RMS
    * clears `rmsThresh`, and keep exactly the samples of the spanning
    * frame range (interior quiet frames stay — trimming is an endpoint
    * operation; VAD-style interior cuts are [[segment]] + [[spectral]]
    * territory). An all-silent clip comes back with ZERO samples (empty
    * pcm) rather than being dropped — attrition accounting stays with
    * the caller. Output is mono PCM16 (the [[resample]] convention); a
    * trailing partial frame counts like any other frame.
    */
  def trimSilence(spark: SparkSession, clips: DataFrame, window: Int,
      rmsThresh: Double): Dataset[Clip] = {
    import spark.implicits._
    require(window >= 1, s"window must be >= 1; got $window")
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .mapPartitions(_.map { c =>
        val mono = toMono(c.pcm, c.channels)
        val nWin = (mono.length + window - 1) / window
        def rmsOf(w: Int): Double = {
          val off = w * window
          val n = math.min(window, mono.length - off)
          var sumSq = 0.0
          var i = 0
          while (i < n) { val v = mono(off + i).toDouble; sumSq += v * v; i += 1 }
          if (n > 0) math.sqrt(sumSq / n) else 0.0
        }
        var first = 0
        while (first < nWin && rmsOf(first) < rmsThresh) first += 1
        var last = nWin - 1
        while (last >= first && rmsOf(last) < rmsThresh) last -= 1
        val from = first * window
        val until = math.min(mono.length, (last + 1) * window)
        val kept = if (first > last) Array.empty[Float]
                   else java.util.Arrays.copyOfRange(mono, from, until)
        val pcm = new Array[Byte](kept.length * 2)
        var i = 0
        while (i < kept.length) {
          val s = math.max(-32768, math.min(32767, math.round(kept(i) * 32768.0f))).toShort
          pcm(i * 2) = (s & 0xff).toByte
          pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        Clip(c.clip_id, c.sample_rate, 1, pcm)
      })
  }

  /** q105 — the spectral kernel as an ORACLED driver query (the q104
    * in-query synthesis device: the gate lake carries no PCM, so a
    * deterministic 8-clip × 32-sample table derives from lineitem's
    * distinct order keys, identically in the DuckDB oracle — clip ids
    * from `l_orderkey % 8`, sample s(clip, t) an exact integer chain,
    * packed into REAL PCM16LE bytes and pushed through the REAL
    * [[spectral]] kernel). Window 8: the one window size whose DFT basis
    * is exactly representable ({0, ±1, ±sqrt(0.5)} — [[twiddles]]), so
    * every power bin, the RMS, and the centroid are fixed IEEE chains
    * both engines reproduce bit-exactly. PCM16 samples are exact dyadic
    * rationals (s·2⁻¹⁵), so the float32 decode loses nothing. Output:
    * one row per (clip, window) with the 5 power bins widened to
    * columns.
    */
  def spectralTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val cells = graft.Tables.lineitem(s, d)
      .select((col("l_orderkey") % 8).as("clip_id")).distinct()
      .select(col("clip_id"), explode(sequence(lit(0), lit(31))).as("t"))
      .select(col("clip_id"), col("t"),
        (((col("clip_id") * 37 + col("t") * col("t") * 29 + 11) % 401) - 200)
          .cast("int").as("s"))
    val clips = cells
      .groupBy("clip_id")
      .agg(sort_array(collect_list(
        struct(col("t").as("_1"), col("s").as("_2")))).as("w"))
      .as[(Long, Seq[(Int, Int)])]
      .map { case (id, w) =>
        val pcm = new Array[Byte](w.length * 2)
        w.foreach { case (t, sv) =>
          pcm(t * 2) = (sv & 0xff).toByte
          pcm(t * 2 + 1) = ((sv >> 8) & 0xff).toByte
        }
        Clip(id, 8000, 1, pcm)
      }
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    spectral(s, clips, window = 8)
      .toDF()
      .select(col("clip_id"), col("win_no").cast("long").as("win_no"),
        col("rms"),
        col("power")(0).as("p0"), col("power")(1).as("p1"),
        col("power")(2).as("p2"), col("power")(3).as("p3"),
        col("power")(4).as("p4"), col("centroid"))
      .orderBy("clip_id", "win_no")
  }

  /** Number of window TRANSITIONS the 64-bit fingerprint samples: each
    * transition contributes nMels−1 sign bits, so ⌈64/(nMels−1)⌉
    * transitions fill the word (10 at the nMels = 8 default). */
  private[multimodal] def fpTransitions(nMels: Int): Int =
    (64 + nMels - 2) / (nMels - 1)

  /** Minimum window count for a FULL 64-bit fingerprint: the sampled
    * transitions need [[fpTransitions]] distinct window pairs. Clips
    * below this zero-pad the word, and padding bits match between ANY
    * two short clips — two unrelated 3-window clips at the defaults
    * differ in only 14 meaningful bits and sit a coin-flip away from the
    * default radius, so [[nearDupClips]] gates candidates on a full
    * word rather than silently collapsing distinct short clips. */
  private[graft] def fpMinWindows(nMels: Int): Int = 1 + fpTransitions(nMels)

  /** Clip-level 64-bit audio fingerprint — the Haitsma & Kalker (ISMIR
    * 2002, "A Highly Robust Audio Fingerprinting System") sign scheme,
    * scaled to one word per clip (the dHash analogue for the audio
    * column): per sampled window transition and adjacent mel-band pair,
    * bit = sign of the band-energy DELTA-OF-DELTAS
    * E(w,m) − E(w,m+1) − (E(w−1,m) − E(w−1,m+1)) over the log mel
    * energies ([[melEnergies]] — the shared spectral front-end), packed
    * transition-major into the low 64 bits.
    *
    * WHOLE-CLIP support: the ⌈64/(nMels−1)⌉ sampled transitions are
    * STRIDED evenly from the clip's first window pair to its last (the
    * way dHash summarizes the whole downsampled image), so two clips
    * sharing only a prefix — leading silence, a common jingle, a beep —
    * differ in every bit drawn from their differing remainder, while a
    * sequential walk (the first-draft layout) would read identical words
    * off the shared first ~0.16 s and collide them into a false family.
    * Sign bits survive volume shifts and mild noise exactly the way
    * dHash gradient signs survive brightness shifts — small
    * perturbations land a few bits apart, exact copies at distance 0.
    *
    * One map over the clip scan (a clip's pcm lives in its own row), no
    * shuffle, 8 bytes of downstream state per clip; only the ≤ 2·⌈64/
    * (nMels−1)⌉ windows touching a sampled transition are DFT'd —
    * per-clip work is CONSTANT in clip length after the mono decode.
    * Clips shorter than [[fpMinWindows]] windows fill fewer than 64 bits
    * (sequential transitions, zero-padded word; < 2 windows carry no
    * delta at all and fingerprint to 0) — [[nearDupClips]] excludes
    * them rather than grouping unrelated short clips on shared padding.
    */
  def fingerprintClips(spark: SparkSession, clips: DataFrame,
      window: Int = 256, nMels: Int = 8): DataFrame = {
    import spark.implicits._
    require(window >= 2, s"window must be >= 2; got $window")
    require(nMels >= 2, s"fingerprint needs >= 2 mel bands; got $nMels")
    val (cosT, sinT) = twiddles(window)
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .map { c =>
        val (nWin, fp) =
          fpKernel(toMono(c.pcm, c.channels), c.sample_rate, window, nMels, cosT, sinT)
        (c.clip_id, nWin.toLong, fp)
      }
      .toDF("clip_id", "n_windows", "fp")
  }

  /** [[fingerprintClips]] keyed by the LAKE identity (bag, topic,
    * time_ns) — the hash pass of the cross-batch streaming guard
    * (jobs.FrameDedupIndex) and of the batch clip-dedup manifest.
    * Emits the image guard's column convention (`dhash`) so the shared
    * banding/probe/grouping machinery is modality-blind. */
  def fingerprintClipsByKey(spark: SparkSession, clips: DataFrame,
      window: Int = 256, nMels: Int = 8): DataFrame = {
    import spark.implicits._
    require(window >= 2, s"window must be >= 2; got $window")
    require(nMels >= 2, s"fingerprint needs >= 2 mel bands; got $nMels")
    val (cosT, sinT) = twiddles(window)
    clips.select("bag", "topic", "time_ns", "sample_rate", "channels", "pcm")
      .as[(String, String, Long, Int, Int, Array[Byte])]
      .map { case (bag, topic, t, rate, ch, pcm) =>
        val (nWin, fp) = fpKernel(toMono(pcm, ch), rate, window, nMels, cosT, sinT)
        (bag, topic, t, nWin.toLong, fp)
      }
      .toDF("bag", "topic", "time_ns", "n_windows", "dhash")
  }

  /** The per-clip fingerprint kernel shared by both entry points:
    * (window count, strided 64-bit HK sign word). */
  private def fpKernel(mono: Array[Float], sampleRate: Int, window: Int,
      nMels: Int, cosT: Array[Double], sinT: Array[Double]): (Int, Long) = {
    val nT = fpTransitions(nMels)
    val nWin = mono.length / window
    val t = nWin - 1 // available transitions (window pairs)
    // sampled transition indices: all of them when the clip is short,
    // else nT indices strided endpoint-inclusive across [1, t]
    val trans: Array[Int] =
      if (t <= 0) Array.empty
      else if (t <= nT) Array.tabulate(t)(_ + 1)
      else if (nT == 1) Array(1 + (t - 1) / 2)
      else Array.tabulate(nT)(k => 1 + (k.toLong * (t - 1) / (nT - 1)).toInt)
    // mel energies only for windows a sampled transition touches
    val melCache = new java.util.HashMap[Integer, Array[Double]]()
    def melOf(w: Int): Array[Double] = {
      val hit = melCache.get(w)
      if (hit != null) hit
      else {
        val v = new Array[Double](window)
        var i = 0
        while (i < window) { v(i) = mono(w * window + i).toDouble; i += 1 }
        val e = melEnergies(dftPower(v, 0, window, cosT, sinT),
          window, sampleRate, nMels)
        melCache.put(w, e)
        e
      }
    }
    var fp = 0L
    var bit = 0
    var ti = 0
    while (ti < trans.length && bit < 64) {
      val ew = melOf(trans(ti))
      val ep = melOf(trans(ti) - 1)
      var m = 0
      while (m < nMels - 1 && bit < 64) {
        val d = ew(m) - ew(m + 1) - (ep(m) - ep(m + 1))
        if (d > 0.0) fp |= (1L << bit)
        bit += 1
        m += 1
      }
      ti += 1
    }
    (nWin, fp)
  }

  /** Audio near-duplicate pairs within a Hamming radius of the clip
    * fingerprint — audio dedup for a multimodal training corpus
    * (re-encoded, re-leveled, or mildly noised copies of a recording;
    * the audio twin of ImageOps.nearDupFrames). Banding rides THE shared
    * pigeonhole block definition (ImageOps.hammingBlocks — one banding
    * for every 64-bit perceptual hash in the engine), candidate pairs
    * form per (block, value) bucket, one exact bit_count(xor) verifies —
    * never clip×clip.
    *
    * Candidates are gated on [[fpMinWindows]] (11 windows ≈ 0.18 s at
    * the 16 kHz defaults): a shorter clip zero-pads the 64-bit word, and
    * since padding bits agree between ANY two clips of the same length
    * class, unrelated short clips would sit within the radius on padding
    * alone and dedupGroupsClips would silently collapse distinct content
    * — a dedup stage must never manufacture data loss from truncation.
    *
    * Gated clips still get the EXACT-duplicate fallback: byte-identical
    * copies of a sub-fpMinWindows clip (same sample_rate/channels/pcm)
    * pair at hamming 0 on a 128-bit content md5 — exact copies must
    * collapse even when the perceptual word cannot be trusted, and
    * content equality has no padding-collision failure mode. Near (but
    * not exact) short duplicates remain ungated by design. */
  def nearDupClips(spark: SparkSession, clips: DataFrame, maxHamming: Int = 3,
      window: Int = 256, nMels: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val fpPairs = nearDupFromClipHashes(
      fingerprintClips(spark, clips, window, nMels)
        .filter(col("n_windows") >= fpMinWindows(nMels).toLong),
      maxHamming)
    // exact-content pairs among the gated shorts: bucket on the md5 (the
    // bucket size is the duplication factor — bounded), pair within
    val shorts = shortClipContentHashes(clips, window, nMels)
    def side(p: String) = shorts.select(col("sample_rate"), col("channels"),
      col("h"), col("clip_id").as(s"${p}_clip_id"))
    val exactPairs = side("a")
      .join(side("b"), Seq("sample_rate", "channels", "h"))
      .filter(col("a_clip_id") < col("b_clip_id"))
      .select(col("a_clip_id"), col("b_clip_id"), lit(0).as("hamming"))
    fpPairs.unionByName(exactPairs)
  }

  /** The sub-[[fpMinWindows]] clip population as (clip_id | key cols,
    * sample_rate, channels, content md5). The window-count arithmetic
    * mirrors [[fpKernel]] exactly (frames = bytes/(2·channels), windows
    * = frames/window, integer division) so the gate and the fallback
    * partition the clip set with no gap or overlap; md5 runs only over
    * the shorts (bounded ≈ fpMinWindows·window·2·channels bytes each),
    * never the corpus. */
  private def shortClipContentHashes(clips: DataFrame, window: Int,
      nMels: Int): DataFrame = {
    import org.apache.spark.sql.functions.{floor, length, lit, md5}
    val nWin = floor(floor(length(col("pcm")) / (lit(2) * col("channels"))) / lit(window))
    clips.filter(nWin < lit(fpMinWindows(nMels)))
      .withColumn("h", md5(col("pcm")))
  }

  /** [[nearDupClips]] over a precomputed (clip_id, fp) table. */
  private[graft] def nearDupFromClipHashes(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    val banded = hashes.select(col("clip_id"), col("fp").as("dhash"))
      .select(col("clip_id"), col("dhash"),
        explode(array(ImageOps.hammingBlocks(maxHamming): _*)).as("bk"))
    def side(p: String) = banded.select(
      col("clip_id").as(s"${p}_clip_id"), col("dhash").as(s"${p}_fp"),
      col("bk").as(s"${p}_bk"))
    side("a").join(side("b"),
        col("a_bk") === col("b_bk") && col("a_clip_id") < col("b_clip_id"))
      .select("a_clip_id", "b_clip_id", "a_fp", "b_fp")
      .dropDuplicates("a_clip_id", "b_clip_id")
      .withColumn("hamming",
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_clip_id"), col("b_clip_id"), col("hamming"))
  }

  /** Audio DEDUP GROUPS: connected components over the [[nearDupClips]]
    * pair index via THE shared min-label propagation engine — a chain of
    * re-encodes a>b>c collapses to one canonical clip even when a and c
    * drift past the radius (the dedupGroupsFrames semantics). Clip ids
    * are already dense longs, so no surrogate-id machinery: edges feed
    * propagateMin directly under an audio-owned cache key. Output: one
    * row per incident clip (clip_id, canon_clip_id, is_canonical);
    * untouched clips are absent — trivially their own canonical. */
  def dedupGroupsClips(spark: SparkSession, clips: DataFrame,
      maxHamming: Int = 3, window: Int = 256, nMels: Int = 8,
      maxRounds: Int = 50): DataFrame =
    graft.operators.DedupOps.propagateMin(spark,
        nearDupClips(spark, clips, maxHamming, window, nMels)
          .select(col("a_clip_id").as("na"), col("b_clip_id").as("nb")),
        maxRounds, cacheKey = "audio-groups")
      .select(col("doc_id").as("clip_id"), col("canonical").as("canon_clip_id"),
        (col("doc_id") === col("canonical")).as("is_canonical"))

  /** [[dedupGroupsClips]] keyed by the LAKE identity (bag, topic,
    * time_ns) — within-batch canonical components over
    * [[fingerprintClipsByKey]], riding the shared modality-blind
    * grouping machinery (ImageOps.dedupGroupsFromHashes, the same engine
    * the image manifest uses); same short-clip gate as [[nearDupClips]].
    * Output: the dedupGroupsFrames column convention (bag, topic,
    * time_ns, canon_*, is_canonical), one row per incident clip. */
  def dedupGroupsClipsByKey(spark: SparkSession, clips: DataFrame,
      maxHamming: Int = 3, window: Int = 256, nMels: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, min, struct}
    val fpGroups = ImageOps.dedupGroupsFromHashes(spark,
      fingerprintClipsByKey(spark, clips, window, nMels)
        .filter(col("n_windows") >= fpMinWindows(nMels).toLong)
        .select("bag", "topic", "time_ns", "dhash"),
      maxHamming)
    // exact-content groups among the gated shorts (the nearDupClips
    // fallback, group form): content equality is TRANSITIVE, so each
    // (rate, channels, md5) bucket IS a complete component — no label
    // propagation needed, one window pass; canonical = the min key (the
    // dedupGroupsFrames convention), singletons absent (incident-only)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sample_rate", "channels", "h")
    val k = struct(col("bag"), col("topic"), col("time_ns"))
    val exactGroups = shortClipContentHashes(
        clips.select("bag", "topic", "time_ns", "sample_rate", "channels", "pcm"),
        window, nMels)
      .withColumn("canon", min(k).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") >= 2)
      .select(col("bag"), col("topic"), col("time_ns"),
        col("canon.bag").as("canon_bag"), col("canon.topic").as("canon_topic"),
        col("canon.time_ns").as("canon_time_ns"),
        (k === col("canon")).as("is_canonical"))
    fpGroups.unionByName(exactGroups)
  }

  /** Per-clip RMS as a drift SCORE frame `(score)` — the cheap audio
    * health statistic the drift gauge distributes (one map over the clip
    * scan, the [[features]] kernel). */
  private[graft] def rmsScoredOf(spark: SparkSession, clips: DataFrame): DataFrame =
    features(spark, clips).toDF().select(col("rms").as("score"))

  /** Frozen RMS drift REFERENCE — the audio twin of the image gauge's
    * brightness reference: decile edges + per-bucket counts of per-clip
    * RMS over a healthy reference recording, captured ONCE offline. */
  def rmsDriftReference(spark: SparkSession, clips: DataFrame,
      buckets: Int = 10): graft.operators.TextAnalysisOps.DriftRef =
    graft.operators.TextAnalysisOps.driftReferenceOf(
      rmsScoredOf(spark, clips), buckets)

  /** PSI of a clip batch's RMS distribution against a frozen
    * [[rmsDriftReference]] — the AUDIO drift gauge (q110's PSI
    * arithmetic through the shared psiFrame core, fourth modality: text
    * has the quality-score gauge, embeddings q108, pixels brightness):
    * a dying microphone collapses RMS toward 0, a clipping or unplugged-
    * ground channel pegs it high — distribution shifts fire here before
    * any consumer errors. Same contract as the others: bucket rows + the
    * −1 rollup whose term IS the PSI, NULL on an empty batch. */
  def rmsDrift(spark: SparkSession, clips: DataFrame,
      ref: graft.operators.TextAnalysisOps.DriftRef): DataFrame =
    graft.operators.TextAnalysisOps.psiAgainst(rmsScoredOf(spark, clips), ref)

  final case class Segment(clip_id: Long, seg_no: Int, sample_rate: Int, channels: Int, pcm: Array[Byte])

  /** Split clips into fixed-length segments (the frame-sampling analog:
    * bounded training windows from long recordings). flatMap keeps it one
    * pass, no shuffle; a 10-hour recording becomes rows, never one buffer.
    */
  def segment(spark: SparkSession, clips: DataFrame, seconds: Double): Dataset[Segment] = {
    import spark.implicits._
    clips.select("clip_id", "sample_rate", "channels", "pcm").as[Clip]
      .flatMap { c =>
        val bytesPerSeg = math.max(1, (seconds * c.sample_rate).toInt) * 2 * c.channels
        c.pcm.grouped(bytesPerSeg).zipWithIndex.map { case (chunk, i) =>
          Segment(c.clip_id, i, c.sample_rate, c.channels, chunk)
        }
      }
  }
}
