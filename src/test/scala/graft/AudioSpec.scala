package graft

import graft.multimodal.AudioOps

class AudioSpec extends SparkSpec {

  /** PCM16LE mono sine at `freq` Hz, amplitude `amp`, 1 second. */
  private def sine(rate: Int, freq: Double, amp: Double): Array[Byte] = {
    val pcm = new Array[Byte](rate * 2)
    for (i <- 0 until rate) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    pcm
  }

  private lazy val clips = {
    import spark.implicits._
    Seq(
      (0L, 8000, 1, sine(8000, 100.0, 0.5)),    // 100 Hz half-amplitude
      (1L, 8000, 1, new Array[Byte](8000 * 2))  // silence
    ).toDF("clip_id", "sample_rate", "channels", "pcm")
  }

  test("features(): RMS/peak/ZCR of a known sine and of silence") {
    val f = AudioOps.features(spark, clips).collect().sortBy(_.clip_id)
    val tone = f(0)
    assert(tone.n_samples === 8000L && tone.duration_s === 1.0)
    // sine RMS = amp/sqrt(2) ~ 0.354, peak ~ 0.5
    assert(math.abs(tone.rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(tone.peak - 0.5) < 0.01)
    // 100 Hz crosses zero 200 times per second
    assert(math.abs(tone.zero_cross_rate * 7999 - 200) <= 1)
    val silence = f(1)
    assert(silence.rms === 0.0 && silence.peak === 0.0 && silence.zero_cross_rate === 0.0)
  }

  test("resample(): halving the rate preserves duration and energy") {
    val r = AudioOps.resample(spark, clips.filter("clip_id = 0"), 4000).collect()(0)
    assert(r.sample_rate === 4000 && r.pcm.length === 4000 * 2)
    import spark.implicits._
    val rf = AudioOps.features(spark,
      Seq((r.clip_id, r.sample_rate, r.channels, r.pcm))
        .toDF("clip_id", "sample_rate", "channels", "pcm")).collect()(0)
    assert(rf.duration_s === 1.0)
    assert(math.abs(rf.rms - 0.5 / math.sqrt(2)) < 0.02) // energy preserved
  }

  test("segment(): fixed windows, one pass, everything accounted for") {
    val segs = AudioOps.segment(spark, clips, 0.25).collect()
    assert(segs.count(_.clip_id == 0L) === 4) // 1s / 0.25s
    assert(segs.filter(_.clip_id == 0L).map(_.pcm.length).sum === 8000 * 2)
    assert(segs.map(_.seg_no).max === 3)
  }
}
