package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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
