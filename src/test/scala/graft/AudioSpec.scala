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

  test("twiddles: the N=8 basis is the exact {0, ±1, ±sqrt(0.5)} table") {
    val r = math.sqrt(0.5)
    val (c, s) = AudioOps.twiddles(8)
    assert(c.toSeq === Seq(1.0, r, 0.0, -r, -1.0, -r, 0.0, r))
    assert(s.toSeq === Seq(0.0, r, 1.0, r, 0.0, -r, -1.0, -r))
    // general N falls back to Math trig but agrees with the exact table
    // wherever both are defined (within an ulp of the libm values)
    val (c16, _) = AudioOps.twiddles(16)
    (0 until 8).foreach(a =>
      assert(math.abs(c16(2 * a) - c(a)) < 1e-15, s"angle $a"))
  }

  test("spectral(): bit-exact vs a naive in-memory DFT + mel recompute (general N)") {
    val n = 16
    val got = AudioOps.spectral(spark, clips, window = n, nMels = 6, nMfcc = 4)
      .collect().map(w => (w.clip_id, w.win_no) -> w).toMap
    // naive recompute from the same PCM bytes, same Math functions —
    // pins the kernel's fold orders and window/offset arithmetic
    val (cosT, sinT) = AudioOps.twiddles(n)
    Seq(0L -> sine(8000, 100.0, 0.5), 1L -> new Array[Byte](8000 * 2)).foreach {
      case (id, pcm) =>
        val mono = (0 until pcm.length / 2).map { i =>
          (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort / 32768.0f).toDouble
        }.toArray
        (0 until mono.length / n).foreach { w =>
          val v = mono.slice(w * n, (w + 1) * n)
          val power = (0 to n / 2).map { m =>
            var re = 0.0; var im = 0.0
            (0 until n).foreach { t =>
              re += v(t) * cosT((m * t) % n); im += v(t) * sinT((m * t) % n)
            }
            re * re + im * im
          }.toArray
          val g = got((id, w))
          assert(g.power.toSeq === power.toSeq, s"clip $id win $w power")
          var sumSq = 0.0; v.foreach(x => sumSq += x * x)
          assert(g.rms === math.sqrt(sumSq / n), s"clip $id win $w rms")
          var wp = 0.0; var tp = 0.0
          (1 to n / 2).foreach { m => wp += m * power(m); tp += power(m) }
          assert(g.centroid === (if (tp > 0) wp / tp else 0.0), s"clip $id win $w centroid")
          val mels = naiveMel(power, n, 8000, 6)
          assert(g.mel.toSeq === mels.toSeq, s"clip $id win $w mel")
          // full MFCC: DCT-II of the log mels, recomputed independently
          val mfcc = (0 until 4).map { k =>
            mels.zipWithIndex.map { case (x, i) =>
              x * Math.cos(Math.PI * k * (i + 0.5) / mels.length)
            }.sum
          }
          assert(g.mfcc.length === 4)
          g.mfcc.zip(mfcc).zipWithIndex.foreach { case ((gv, ev), k) =>
            assert(math.abs(gv - ev) < 1e-12, s"clip $id win $w mfcc[$k]: $gv vs $ev")
          }
        }
    }
    // structural count: full windows only, trailing partial dropped
    assert(got.count(_._1._1 == 0L) === 8000 / n)
  }

  /** Naive mel filterbank (independent of the kernel's loop structure). */
  private def naiveMel(power: Array[Double], n: Int, rate: Int, nMels: Int): Array[Double] = {
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def inv(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val top = mel(rate / 2.0)
    val edges = (0 until nMels + 2).map(i => inv(top * i / (nMels + 1)))
    (0 until nMels).map { f =>
      val (lo, mid, hi) = (edges(f), edges(f + 1), edges(f + 2))
      val e = power.indices.map { b =>
        val freq = b.toDouble * rate / n
        val w = if (freq <= lo || freq >= hi) 0.0
                else if (freq <= mid) (freq - lo) / (mid - lo)
                else (hi - freq) / (hi - mid)
        w * power(b)
      }.sum
      math.log(math.max(e, 1e-12))
    }.toArray
  }

  test("spectral(): a pure tone at a bin frequency concentrates its power there") {
    import spark.implicits._
    // 1000 Hz at rate 8000 = bin 2 of a 16-sample window (2·8000/16)
    val tone = Seq((5L, 8000, 1, sine(8000, 1000.0, 0.5)))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    val w0 = AudioOps.spectral(spark, tone, window = 16).collect()
      .find(w => w.clip_id == 5L && w.win_no == 0).get
    val p = w0.power
    assert(p(2) > 0.9 * p.sum, s"bin 2 should dominate: ${p.toSeq}")
    assert(math.abs(w0.centroid - 2.0) < 0.05, s"centroid ${w0.centroid}")
    // silence: all-zero power, centroid pinned to 0 (not NaN)
    val sw = AudioOps.spectral(spark, clips.filter("clip_id = 1"), window = 16)
      .collect().head
    assert(sw.power.forall(_ === 0.0) && sw.centroid === 0.0 && sw.rms === 0.0)
  }

  test("trimSilence(): endpoint trim exact; all-silent empties; no-silence is identity") {
    import spark.implicits._
    val rate = 8000
    val toneSec = sine(rate, 1000.0, 0.5)
    val silence = new Array[Byte](rate * 2)
    val padded = silence ++ toneSec ++ silence
    val in = Seq(
      (0L, rate, 1, padded),   // silence | tone | silence
      (1L, rate, 1, silence),  // all silent
      (2L, rate, 1, toneSec))  // no silence
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    val out = AudioOps.trimSilence(spark, in, window = 400, rmsThresh = 0.01)
      .collect().map(c => c.clip_id -> c).toMap
    // the padding is window-aligned (8000 = 20 windows of 400), so the
    // trim boundary is exact: the kept bytes ARE the tone second
    assert(out(0L).pcm.toSeq === toneSec.toSeq, "trim must keep exactly the tone")
    assert(out(1L).pcm.isEmpty, "an all-silent clip keeps zero samples")
    assert(out(2L).pcm.toSeq === toneSec.toSeq, "a no-silence clip passes through")
    out.values.foreach(c => assert(c.channels === 1 && c.sample_rate === rate))
  }

  test("fingerprint/nearDup/dedupGroups: exact copy at distance 0, a re-leveled copy " +
    "lands in the radius, distinct content stays out; chains group to one canonical") {
    import spark.implicits._
    val rate = 8000
    def mix(amp: Double, f1: Double, f2: Double): Array[Byte] = {
      val pcm = new Array[Byte](rate * 2)
      for (i <- 0 until rate) {
        val s = ((math.sin(2 * math.Pi * f1 * i / rate) * 0.6 +
          math.sin(2 * math.Pi * f2 * i / rate) * 0.4) * amp * 32767).toInt
        val c = math.max(-32768, math.min(32767, s)).toShort
        pcm(i * 2) = (c & 0xff).toByte
        pcm(i * 2 + 1) = ((c >> 8) & 0xff).toByte
      }
      pcm
    }
    val base = mix(0.5, 220.0, 930.0)
    val clips = Seq(
      (0L, rate, 1, base),                  // original
      (1L, rate, 1, base.clone),            // exact copy
      (2L, rate, 1, mix(0.45, 220.0, 930.0)), // re-leveled copy (volume shift)
      (3L, rate, 1, mix(0.40, 220.0, 930.0)), // further re-level: chains 2>3
      (4L, rate, 1, mix(0.5, 615.0, 1850.0)), // different content
      (5L, rate, 1, new Array[Byte](300))      // < 2 windows: excluded, never grouped
    ).toDF("clip_id", "sample_rate", "channels", "pcm")

    val fps = AudioOps.fingerprintClips(spark, clips).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fps(0L)._2 === fps(1L)._2, "exact copy must fingerprint identically")
    assert(fps(5L)._1 <= 1L, "short clip has < 2 windows")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // volume shift preserves every delta sign (log-mel differences shift
    // by a constant that cancels in the delta-of-deltas) — distance 0 or
    // a few bits; different CONTENT flips many signs
    assert(ham(fps(0L)._2, fps(2L)._2) <= 3, s"re-level drifted ${ham(fps(0L)._2, fps(2L)._2)} bits")
    assert(ham(fps(0L)._2, fps(4L)._2) > 3, s"distinct content only ${ham(fps(0L)._2, fps(4L)._2)} bits away")

    val pairs = AudioOps.nearDupClips(spark, clips).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 1L)), "exact copy pair missing")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 0)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "distinct clip must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "short clip must be excluded")

    val groups = AudioOps.dedupGroupsClips(spark, clips).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // 0/1/2 (and 3 via the 2>3 chain if in radius) collapse onto clip 0
    assert(groups(0L) === ((0L, true)))
    assert(groups(1L) === ((0L, false)))
    assert(groups(2L)._1 === 0L)
    assert(!groups.contains(4L), "untouched clip must be absent (its own canonical)")
  }

  /** PCM16LE mono: `head` samples of tone f0, remainder tone f1. */
  private def prefixed(rate: Int, n: Int, head: Int, f0: Double, f1: Double): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val f = if (i < head) f0 else f1
      val s = (math.sin(2 * math.Pi * f * i / rate) * 0.5 * 32767).toInt.toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    pcm
  }

  test("fingerprint covers the WHOLE clip: clips identical in the first 0.2s but " +
    "different after must NOT pair (the prefix-collision regression)") {
    import spark.implicits._
    val rate = 8000
    // 1600 shared samples (~6 windows at 256) — more than half the OLD
    // sequential fingerprint's support — then 6400 samples of distinct
    // content; the strided word draws ~9 of its 10 transitions from the
    // differing remainder, so these must stay far apart
    val a = prefixed(rate, 8000, 1600, 400.0, 900.0)
    val b = prefixed(rate, 8000, 1600, 400.0, 1700.0)
    val clips = Seq((0L, rate, 1, a), (1L, rate, 1, b))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    val fps = AudioOps.fingerprintClips(spark, clips).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ham = java.lang.Long.bitCount(fps(0L) ^ fps(1L))
    assert(ham > 3, s"shared-prefix clips only $ham bits apart — prefix-only coverage")
    assert(AudioOps.nearDupClips(spark, clips).count() === 0L,
      "shared-prefix clips with different tails must not pair")
  }

  test("fingerprint is trim-tolerant: a copy with its first window cut still pairs") {
    import spark.implicits._
    val rate = 8000
    // one bin-aligned tone per mel band (multiples of rate/window =
    // 31.25 Hz — zero spectral leakage), each with a SLOW amplitude
    // modulation: every band's energy varies smoothly across the clip,
    // so the delta-of-delta signs at a ±1-window-shifted sampled
    // transition mostly agree — the robustness HK sign bits promise.
    // (A sparse signal would leave most bands at the quantization-noise
    // floor, where signs are coin flips under any shift.)
    val freqs = Seq(156.25, 375.0, 656.25, 1000.0, 1406.25, 1937.5, 2593.75, 3406.25)
    def multi(n: Int, cycles: Double, phase: Double): Array[Byte] = {
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        var acc = 0.0
        freqs.zipWithIndex.foreach { case (f, b) =>
          val amp = 0.05 + 0.04 * math.sin(2 * math.Pi * cycles * i / n + phase + b * 0.7)
          acc += math.sin(2 * math.Pi * f * i / rate) * amp
        }
        val c = math.max(-32768, math.min(32767, (acc * 32767).toInt)).toShort
        pcm(i * 2) = (c & 0xff).toByte
        pcm(i * 2 + 1) = ((c >> 8) & 0xff).toByte
      }
      pcm
    }
    val base = multi(16384, 1.0, 0.0) // 64 windows
    val trimmed = base.drop(256 * 2) // first WINDOW removed (one transition shift)
    val distinct = multi(16384, 3.0, 2.1) // same bands, different modulation
    val clips = Seq((0L, rate, 1, base), (1L, rate, 1, trimmed), (2L, rate, 1, distinct))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    val fps = AudioOps.fingerprintClips(spark, clips).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val pairs = AudioOps.nearDupClips(spark, clips, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      s"one-window trim must still pair (drift ${ham(fps(0L), fps(1L))} bits)")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"unrelated content must stay out at the same radius " +
        s"(${ham(fps(0L), fps(2L))}/${ham(fps(1L), fps(2L))} bits)")
  }

  test("short clips that cannot fill the 64-bit word are gated out of candidates " +
    "(unrelated shorts must never collapse on shared zero padding)") {
    import spark.implicits._
    val rate = 8000
    // 4 windows = 3 transitions = 21 meaningful bits; 43 shared padding
    // bits would put ANY two such clips within a coin flip of radius 3
    val clips = Seq(
      (0L, rate, 1, prefixed(rate, 1024, 0, 0.0, 500.0)),
      (1L, rate, 1, prefixed(rate, 1024, 0, 0.0, 1900.0)),
      (2L, rate, 1, prefixed(rate, 1024, 0, 0.0, 3100.0)))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    assert(AudioOps.fpMinWindows(8) === 11)
    assert(AudioOps.nearDupClips(spark, clips).count() === 0L,
      "sub-fpMinWindows clips must be excluded from the pair index")
    assert(AudioOps.dedupGroupsClips(spark, clips).count() === 0L,
      "no short clip may be grouped (each stays its own canonical)")
    // an 11-window clip fills the word and IS a candidate (its exact copy pairs)
    val full = prefixed(rate, 256 * 11, 0, 0.0, 700.0)
    val ok = Seq((10L, rate, 1, full), (11L, rate, 1, full.clone))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    assert(AudioOps.nearDupClips(spark, ok).count() === 1L)
  }

  test("byte-exact copies of a sub-fpMinWindows clip still collapse via the " +
    "content-hash fallback; near-but-not-exact shorts stay apart") {
    import spark.implicits._
    val rate = 8000
    val short = prefixed(rate, 1024, 0, 0.0, 500.0) // 4 windows < fpMinWindows
    val nearShort = short.clone(); nearShort(10) = (nearShort(10) ^ 1).toByte
    val clips = Seq(
      (0L, rate, 1, short),             // exact pair with 1
      (1L, rate, 1, short.clone),
      (2L, rate, 1, nearShort),         // 1 bit off: NOT exact, must not pair
      (3L, rate, 2, short.clone),       // same bytes, different channels: distinct
      (4L, rate, 1, prefixed(rate, 1024, 0, 0.0, 3100.0)))
      .toDF("clip_id", "sample_rate", "channels", "pcm")
    val pairs = AudioOps.nearDupClips(spark, clips)
      .select("a_clip_id", "b_clip_id", "hamming").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)),
      "only the byte-exact short pair may form")
    assert(pairs.head.getInt(2) === 0, "exact-content pairs report hamming 0")
    val groups = AudioOps.dedupGroupsClips(spark, clips).collect()
      .map(r => r.getAs[Long]("clip_id") -> r.getAs[Long]("canon_clip_id")).toMap
    assert(groups === Map(0L -> 0L, 1L -> 0L),
      "exact shorts group to the min clip_id; everything else stays absent")

    // the lake-keyed group path shares the fallback
    val byKey = Seq(
      ("a.bag", "/mic", 100L, rate, 1, short),
      ("a.bag", "/mic", 200L, rate, 1, short.clone),
      ("a.bag", "/mic", 300L, rate, 1, nearShort))
      .toDF("bag", "topic", "time_ns", "sample_rate", "channels", "pcm")
    val g = AudioOps.dedupGroupsClipsByKey(spark, byKey).collect()
    assert(g.length === 2)
    assert(g.forall(_.getAs[Long]("canon_time_ns") === 100L))
    assert(g.map(r => r.getAs[Long]("time_ns") -> r.getAs[Boolean]("is_canonical"))
      .toMap === Map(100L -> true, 200L -> false))
  }
}
