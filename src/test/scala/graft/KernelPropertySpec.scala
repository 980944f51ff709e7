package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.RecordIO
import graft.jobs.RecordIO.Record
import graft.multimodal.{AudioOps, PixelKernels}

/** Property-style checks for the byte-level kernels — the components where
  * a single off-by-one on a stride or frame boundary corrupts data
  * silently. Cases are generated from a deterministic PRNG (fixed seeds, so
  * failures reproduce exactly). Pure JVM, no SparkSession needed.
  */
class KernelPropertySpec extends AnyFunSuite {

  test("property: PNG encode->decode is the identity on random frames of every encoding") {
    val rng = new Rng(0xBEEF)
    for (trial <- 0 until 40) {
      val (encoding, ch) = Seq(("mono8", 1), ("rgb8", 3), ("rgba8", 4))(trial % 3)
      val w = 1 + (rng.next() % 40).toInt.abs
      val h = 1 + (rng.next() % 30).toInt.abs
      val pad = (rng.next() % 4).toInt.abs // stride padding to exercise step
      val stride = w * ch + pad
      val px = Array.tabulate[Byte](h * stride)(_ => rng.next().toByte)
      val png = graft.multimodal.PngEncoder.encode(px, w, h, encoding, srcStride = stride)
      val d = graft.multimodal.PngDecoder.decode(png)
      assert(d.width === w && d.height === h && d.encoding === encoding,
        s"trial $trial ${w}x$h $encoding")
      // decoded buffer is TIGHT; compare row content, skipping source padding
      val tight = Array.tabulate[Byte](h * w * ch)(i => px((i / (w * ch)) * stride + i % (w * ch)))
      assert(d.step === w * ch && d.pixels.toSeq === tight.toSeq, s"trial $trial")
    }
  }

  /** splitmix64 — deterministic case generator. */
  private final class Rng(seed: Long) {
    private var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def int(lo: Int, hi: Int): Int = lo + (math.floorMod(next(), (hi - lo + 1).toLong)).toInt
  }

  private def buffer(h: Int, step: Int, r: Rng): Array[Byte] =
    Array.tabulate(h * step)(_ => r.int(0, 255).toByte)

  private def cases(n: Int)(body: (Int, Int, Int, Int, Rng) => Unit): Unit =
    (0 until n).foreach { i =>
      val r = new Rng(i * 7919L + 1)
      val w = r.int(1, 24); val h = r.int(1, 16)
      val ch = Seq(1, 3, 4)(r.int(0, 2))
      val step = w * ch + r.int(0, 5)
      body(w, h, ch, step, r)
    }

  test("blur of a constant image is the identity, any dims/stride/sigma") {
    cases(60) { (w, h, ch, step, r) =>
      val v = r.int(1, 255).toByte
      val sigma = 0.5 + r.int(0, 195) / 10.0
      val out = PixelKernels.gaussianBlur(Array.fill[Byte](h * step)(v), w, h, ch, step, sigma)
      assert(out.forall(_ == v), s"dims ($w,$h,$ch,$step) sigma $sigma")
    }
  }

  test("blurRegions: outside-box and padding bytes bit-identical, any geometry") {
    cases(60) { (w, h, ch, step, r) =>
      val px = buffer(h, step, r)
      val box = (w / 4, h / 4, w / 4 + math.max(1, w / 2), h / 4 + math.max(1, h / 2))
      val out = PixelKernels.blurRegions(px, w, h, ch, step, Seq(box), sigma = 2.0)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
        val inside = x >= box._1 && x < box._3 && y >= box._2 && y < box._4
        if (!inside)
          assert(out(y * step + x * ch + c) === px(y * step + x * ch + c),
            s"mutated outside box at ($x,$y,$c), dims ($w,$h,$ch,$step)")
      }
      for (y <- 0 until h; p <- w * ch until step)
        assert(out(y * step + p) === px(y * step + p), "padding byte mutated")
    }
  }

  test("resize to the same dims is the identity on pixel data") {
    cases(60) { (w, h, ch, step, r) =>
      val px = buffer(h, step, r)
      val out = PixelKernels.resizeBilinear(px, w, h, ch, step, w, h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(out((y * w + x) * ch + c) === px(y * step + x * ch + c),
          s"identity resize changed ($x,$y,$c), dims ($w,$h,$ch,$step)")
    }
  }

  test("resize output range stays within input range (convex interpolation)") {
    cases(60) { (w, h, ch, step, r) =>
      val px = buffer(h, step, r)
      val tw = r.int(1, 24); val th = r.int(1, 16)
      val vals = for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        yield px(y * step + x * ch + c) & 0xff
      val out = PixelKernels.resizeBilinear(px, w, h, ch, step, tw, th)
      out.foreach { b =>
        assert((b & 0xff) >= vals.min - 1 && (b & 0xff) <= vals.max + 1,
          s"resize invented value ${b & 0xff} outside [${vals.min}, ${vals.max}]")
      }
    }
  }

  test("RecordIO pack/unpack roundtrips arbitrary records and shards") {
    (0 until 40).foreach { i =>
      val r = new Rng(i * 104729L + 3)
      val recs = (0 until r.int(1, 6)).map { _ =>
        Record(r.next() & Long.MaxValue,
          Array.fill(r.int(0, 9))(java.lang.Float.intBitsToFloat(r.int(0, 1 << 22))),
          Array.fill(r.int(0, 33))(r.int(0, 255).toByte))
      }
      val shard = recs.flatMap(x => RecordIO.pack(x).toSeq).toArray
      val back = RecordIO.unpackShard(shard).toList
      assert(back.length === recs.length)
      back.zip(recs).foreach { case (b, x) =>
        assert(b.id === x.id)
        assert(b.label.toSeq === x.label.toSeq)
        assert(b.image.toSeq === x.image.toSeq)
      }
    }
  }

  test("graft_overlap equals naive set intersection, any sorted inputs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (0 until 60).foreach { i =>
      val r = new Rng(i * 999331L + 11)
      def sortedDistinct(n: Int): Array[Long] =
        Array.fill(n)(r.next() & 1023L).distinct.sorted
      val a = sortedDistinct(r.int(0, 40))
      val b = sortedDistinct(r.int(0, 40))
      val got = graft.plans.SetKernels.overlap(new GenericArrayData(a), new GenericArrayData(b))
      assert(got === a.toSet.intersect(b.toSet).size.toLong, s"case $i")
    }
  }

  test("graft_q8_stats: per-element error bound, saturation of the argmax, zero-vector identity") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (0 until 60).foreach { i =>
      val r = new Rng(i * 49979687L + 13)
      val n = r.int(1, 96)
      val v = Array.fill(n)((r.int(0, 2000) - 1000) / 250.0)
      val row = graft.plans.QuantKernels.q8Stats(new GenericArrayData(v))
      val (sse, maxerr, nsat) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
      val maxabs = v.map(math.abs).max
      if (maxabs == 0.0) {
        assert(sse === 0.0 && maxerr === 0.0 && nsat === 0L)
      } else {
        val scale = maxabs / 127.0
        // round-to-nearest error is at most half a quantization step
        assert(maxerr <= scale / 2 + 1e-12, s"case $i: maxerr $maxerr vs step $scale")
        assert(sse <= n * (scale / 2 + 1e-12) * (scale / 2 + 1e-12))
        assert(nsat >= 1, s"case $i: the max-abs element must quantize to ±127")
      }
    }
  }

  test("graft_doc_pairs emits exactly C(n,2) ordered pairs, ids sorted, payload carried") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val elemT = new StructType().add("doc_id", LongType).add("n", LongType)
    val gen = graft.plans.DocPairGen(BoundReference(0, ArrayType(elemT), nullable = true))
    (0 until 40).foreach { i =>
      val r = new Rng(i * 32452843L + 17)
      val ids = Array.fill(r.int(0, 12))(r.next() & 4095L).distinct
      val docs = ids.map(id => new GenericInternalRow(Array[Any](id, id * 10 + 1)))
      val input = new GenericInternalRow(Array[Any](new GenericArrayData(docs.toArray[Any])))
      val out = gen.eval(input.asInstanceOf[InternalRow]).iterator.toList
      val m = ids.length
      assert(out.length === m * (m - 1) / 2, s"case $i")
      val seen = out.map { p =>
        val (a, b, na, nb) = (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))
        assert(a < b, s"case $i: pair not ordered")
        assert(na === a * 10 + 1 && nb === b * 10 + 1, s"case $i: payload mismatch")
        (a, b)
      }
      assert(seen.distinct.length === seen.length, s"case $i: duplicate pairs")
      val expected = ids.sorted.combinations(2).map(p => (p(0), p(1))).toSet
      assert(seen.toSet === expected, s"case $i")
    }
  }

  test("audio resample length matches rate ratio, any rates") {
    (0 until 60).foreach { i =>
      val r = new Rng(i * 15485863L + 7)
      val from = r.int(100, 4000); val to = r.int(100, 4000); val n = r.int(1, 4000)
      val mono = Array.tabulate(n)(j => math.sin(j * 0.1).toFloat)
      val out = AudioOps.resampleLinear(mono, from, to)
      val expected =
        if (from == to) n else math.max(1, math.round(n.toLong * to.toDouble / from).toInt)
      assert(out.length === expected, s"from $from to $to n $n")
    }
  }

  test("property: greedy NMS kernel matches an independent naive sweep on random boxes") {
    import graft.operators.RosbagDomainOps
    import graft.operators.RosbagDomainOps.Det
    val rng = new Rng(0xD0D0)
    def iou(a: Det, b: Det): Double = {
      val iw = math.min(a.x + a.w, b.x + b.w) - math.max(a.x, b.x)
      val ih = math.min(a.y + a.h, b.y + b.h) - math.max(a.y, b.y)
      val inter = math.max(0L, iw) * math.max(0L, ih)
      inter.toDouble / (a.w * a.h + b.w * b.h - inter)
    }
    for (trial <- 0 until 120) {
      val n = rng.int(0, 60)
      val thresh = Seq(0.0, 0.3, 0.45, 0.7, 0.99)(trial % 5)
      val topk = if (trial % 7 == 0) rng.int(1, 10) else 400
      // clustered boxes so overlaps actually occur; duplicate scores so
      // the pred_id tie-break is exercised
      val cands = Array.tabulate(n) { i =>
        Det(0L, 0L, i.toLong,
          rng.int(0, 60).toLong, rng.int(0, 60).toLong,
          rng.int(5, 40).toLong, rng.int(5, 40).toLong,
          rng.int(0, 15).toLong)
      }
      // independent naive: explicit sorted fold, fresh comparison code
      val ranked = cands.sortBy(d => (-d.si, d.pred_id)).take(topk)
      val naive = ranked.foldLeft(Vector.empty[Det]) { (kept, c) =>
        if (kept.exists(k => iou(k, c) > thresh)) kept else kept :+ c
      }
      val got = RosbagDomainOps.nmsGroup(cands.clone(), thresh, topk)
      assert(got.toSeq === naive.toSeq, s"trial $trial n=$n thresh=$thresh topk=$topk")
      // invariants: kept boxes pairwise within the gate; every suppressed
      // candidate is dominated by a kept box that outranks it
      for (a <- got; b <- got if a.pred_id < b.pred_id)
        assert(iou(a, b) <= thresh, s"trial $trial kept overlap")
      val keptIds = got.map(_.pred_id).toSet
      ranked.filterNot(d => keptIds(d.pred_id)).foreach { sdet =>
        assert(got.exists(k => (k.si > sdet.si ||
            (k.si == sdet.si && k.pred_id < sdet.pred_id))
          && iou(k, sdet) > thresh), s"trial $trial undominated suppression")
      }
    }
  }

}
