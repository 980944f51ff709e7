package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Invariant specs for the ROS-bag-domain operators. */
class DomainOpsSpec extends SparkSpec {

  test("q20 frame index: dense per-camera numbering starting at 1") {
    val df = RosbagDomainOps.frameIndex(spark, sf)
    val perUser = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("frame_no").as("lo"), max("frame_no").as("hi"))
    assert(perUser.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
  }

  test("q21 sessionize: session event counts sum to total events") {
    val total = Tables.events(spark, sf).count()
    val sessions = RosbagDomainOps.sessionize(spark, sf)
    assert(sessions.agg(sum("n_events")).collect()(0).getLong(0) === total)
    // durations are non-negative and below the theoretical max span
    assert(sessions.filter(col("duration_s") < 0).count() === 0)
  }

  test("q26 asof join matches a naive per-row computation on a sample") {
    val e = Tables.events(spark, sf).select("event_id", "user_id", "ts", "event_type").collect()
    val clicks = e.filter(_.getAs[String]("event_type") == "click")
    val views = e.filter(_.getAs[String]("event_type") == "view").take(50)
    val naive = views.map { v =>
      val cands = clicks.filter(c => c.getAs[Long]("user_id") == v.getAs[Long]("user_id") &&
        c.getAs[Long]("ts") <= v.getAs[Long]("ts"))
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy(c => (c.getAs[Long]("ts"), c.getAs[Long]("event_id"))))
      v.getAs[Long]("event_id") -> best.map(_.getAs[Long]("event_id"))
    }.toMap
    val got = RosbagDomainOps.asofJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("view_id") -> Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong))
      .toMap
    naive.foreach { case (viewId, expected) =>
      assert(got.get(viewId).flatten === expected, s"view $viewId")
    }
  }

  test("q29 IoU values are in (0, 1]") {
    val ious = RosbagDomainOps.bboxIou(spark, sf).select("iou").collect().map(_.getDouble(0))
    assert(ious.nonEmpty && ious.forall(v => v > 0.0 && v <= 1.0))
  }

  test("q23 detection pivot: per-day counts reconcile with raw events") {
    val pivot = RosbagDomainOps.detectMaxConf(spark, sf)
    val nClicks = pivot.agg(sum("n_click")).collect()(0).getLong(0)
    val raw = Tables.events(spark, sf).filter(col("event_type") === "click").count()
    assert(nClicks === raw)
  }

  test("native graft_dot agrees with HOF fold and SQL registration works") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val native = df.select(graft.functions.VectorFunctions.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).collect()(0).getDouble(0)
    assert(native === 32.0 && hof === 32.0)
    df.createOrReplaceTempView("vecs")
    assert(spark.sql("select graft_dot(a, b) from vecs").collect()(0).getDouble(0) === 32.0)
    assert(spark.sql("select graft_charhash('abc')").collect()(0).getLong(0) === 96354L)
  }

  test("q32 track stitch: tracks are gap-free chains that conserve detections") {
    val tracks = operators.RosbagDomainOps.trackStitch(spark, sf).collect()
    assert(tracks.nonEmpty)
    val nEvents = Tables.events(spark, sf).count()
    // every detection lands in exactly one track
    assert(tracks.map(_.getLong(2)).sum === nEvents)
    tracks.foreach { r =>
      val (track, n, tf, tl) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      // mutual-best links advance the time step by exactly 1 and a
      // detection carries at most one link per side, so a track occupies
      // consecutive tsteps with one detection each
      assert(n === tl - tf + 1, s"track $track: $n dets over [$tf,$tl]")
    }
    // the stitcher actually links (not all-singleton) on the gate lake
    assert(tracks.exists(_.getLong(2) > 1L), "no multi-detection tracks")
  }

  test("q32 propagation latency bound: jobs are logarithmic in track length (pointer jumping)") {
    import spark.implicits._
    // a single 65-node PATH — the worst case for min-label propagation
    // (diameter 64). One-hop propagation would need ~64 rounds at one
    // job each; pointer jumping needs ~log2(64)+1. Counting JOBS bounds
    // both failure modes at once: O(diameter) rounds, or a round that
    // stops fusing its change detection into the single snapshot count.
    val pairs = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val labels = DedupOps.propagateMin(spark, pairs, maxRounds = 200,
        cacheKey = "latency-spec").collect()
      // the whole path collapses onto node 0
      assert(labels.length === 65)
      assert(labels.forall(_.getLong(1) === 0L), labels.take(5).mkString(","))
      // ROUNDS are the latency bound: path doubling closes distance
      // 2^(r+1)-1 after r rounds, so a 64-edge path needs 6 doubling
      // rounds + 1 verification — O(diameter) would need ~64
      val rounds = DedupOps.lastPropagationRounds.get()
      assert(rounds <= 9, s"propagateMin took $rounds rounds on a 64-edge path — " +
        "pointer jumping should close it in ~log2(L)+1")
      // listener events are async — wait for the count to go stable
      var last = -1; var spins = 0
      while (jobs != last && spins < 50) { last = jobs; Thread.sleep(100); spins += 1 }
      // jobs-per-round must stay CONSTANT (snapshot count + its joins'
      // broadcast collects + AQE materializations — ~8 on this tiny
      // input): a round that starts re-counting its snapshot or
      // re-planning the whole lineage would multiply this
      assert(jobs <= 12 * rounds + 10, s"propagateMin ran $jobs jobs over $rounds " +
        "rounds — per-round job count is no longer constant")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q29b detection eval: mutual-best matching matches a naive recompute") {
    import org.apache.spark.sql.functions._
    val got = operators.RosbagDomainOps.detEval(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    // naive driver-side recompute from the same synthetic box model
    case class Box(id: Long, img: Long, cls: Long, x: Long, y: Long, w: Long, h: Long)
    val all = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size")).collect().map { r =>
        val k = r.getLong(0)
        val sz = r.get(1) match { case i: Int => i.toLong; case l: Long => l }
        Box(k, k / 40, k % 3, (k * 37) % 700, (k * 53) % 500,
          (sz * 7) % 100 + 20, (sz * 11) % 80 + 20)
      }
    val (gt, pr) = all.partition(_.id % 2 == 0)
    def iou(a: Box, b: Box): Double = {
      val iw = math.max(0L, math.min(a.x + a.w, b.x + b.w) - math.max(a.x, b.x))
      val ih = math.max(0L, math.min(a.y + a.h, b.y + b.h) - math.max(a.y, b.y))
      val inter = iw * ih
      inter.toDouble / (a.w * a.h + b.w * b.h - inter)
    }
    val pairs = for {
      g <- gt; p <- pr
      if g.img == p.img && g.cls == p.cls && iou(g, p) >= 0.5
    } yield (g, p, iou(g, p))
    def best[K](side: ((Box, Box, Double)) => Long, other: ((Box, Box, Double)) => Long) =
      pairs.groupBy(side).map { case (k, ps) =>
        k -> other(ps.minBy(t => (-t._3, other(t))))
      }
    val bp = best(t => t._2.id, t => t._1.id) // pred -> its best gt
    val bg = best(t => t._1.id, t => t._2.id) // gt -> its best pred
    val matched = bp.toSeq.filter { case (p, g) => bg.get(g).contains(p) }
    val expect = (0L to 2L).map { c =>
      c -> ((gt.count(_.cls == c).toLong, pr.count(_.cls == c).toLong,
        matched.count { case (p, _) => p % 3 == c }.toLong))
    }.toMap
    assert(got === expect)
    got.values.foreach { case (ng, np, nm) => assert(nm <= math.min(ng, np)) }
  }

  // The q29c/q29d scored-detection model, recomputed driver-side from
  // `part` — three proposals per GT object (tight/loose/background), the
  // mirror of RosbagDomainOps.scoredDetections for independent naive
  // recomputes below.
  private case class Det(id: Long, img: Long, cls: Long, x: Long, y: Long,
      w: Long, h: Long, si: Long)

  private def naiveModel(): (Seq[Det], Seq[Det]) = {
    import org.apache.spark.sql.functions._
    val gts = Tables.part(spark, sf).select(col("p_partkey"), col("p_size")).collect().map { r =>
      val k = r.getLong(0)
      val sz = r.get(1) match { case i: Int => i.toLong; case l: Long => l }
      Det(k, k / 40, k % 3, (k * 37) % 700, (k * 53) % 500,
        (sz * 7) % 100 + 20, (sz * 11) % 80 + 20, 0L)
    }.toSeq
    val dets = gts.flatMap { g =>
      val k = g.id
      Seq(
        Det(k * 3, g.img, g.cls, g.x + k % 11 - 5, g.y + (k * 3) % 11 - 5,
          g.w + k % 7 - 3, g.h + (k * 5) % 7 - 3, 600 + (k * 13) % 400),
        Det(k * 3 + 1, g.img, g.cls, g.x + (k * 5) % 15 - 7, g.y + (k * 7) % 15 - 7,
          g.w + k % 9 - 4, g.h + (k * 11) % 9 - 4, 300 + (k * 17) % 400),
        Det(k * 3 + 2, g.img, g.cls, (g.x + 200 + (k * 19) % 300) % 700,
          (g.y + 150 + (k * 23) % 200) % 500,
          (k * 29) % 80 + 20, (k * 31) % 60 + 20, (k * 37) % 1000))
    }
    (gts, dets)
  }

  private def iouD(a: Det, b: Det): Double = {
    val iw = math.max(0L, math.min(a.x + a.w, b.x + b.w) - math.max(a.x, b.x))
    val ih = math.max(0L, math.min(a.y + a.h, b.y + b.h) - math.max(a.y, b.y))
    val inter = iw * ih
    inter.toDouble / (a.w * a.h + b.w * b.h - inter)
  }

  // Plain sequential greedy NMS per (image, class) — the textbook loop the
  // distributed kernel must reproduce exactly.
  private def naiveNms(dets: Seq[Det], thresh: Double = 0.45): Seq[Det] =
    dets.groupBy(d => (d.img, d.cls)).toSeq.flatMap { case (_, ds) =>
      val ranked = ds.sortBy(d => (-d.si, d.id))
      ranked.foldLeft(Vector.empty[Det]) { (kept, c) =>
        if (kept.forall(k => iouD(k, c) <= thresh)) kept :+ c else kept
      }
    }

  test("q29d nms: exact parity with sequential greedy + suppression invariants") {
    val (_, dets) = naiveModel()
    val expect = naiveNms(dets).map(_.id).toSet
    val got = operators.RosbagDomainOps.nmsTable(spark, sf).collect()
      .map(_.getAs[Long]("pred_id")).toSet
    assert(got === expect)
    assert(got.size < dets.size, "NMS must actually suppress on this model")
    // no two kept boxes of one (image, class) group overlap past the gate
    val byId = dets.map(d => d.id -> d).toMap
    val kept = got.toSeq.map(byId)
    kept.groupBy(d => (d.img, d.cls)).foreach { case (_, ks) =>
      for (a <- ks; b <- ks if a.id < b.id)
        assert(iouD(a, b) <= 0.45, s"kept pair ${a.id},${b.id} overlaps")
    }
    // greedy completeness: every suppressed box overlaps some kept box
    // that outranks it
    dets.filterNot(d => got(d.id)).foreach { s =>
      val winners = kept.filter(k => k.img == s.img && k.cls == s.cls &&
        (k.si > s.si || (k.si == s.si && k.id < s.id)) && iouD(k, s) > 0.45)
      assert(winners.nonEmpty, s"suppressed ${s.id} has no dominating kept box")
    }
  }

  test("q29c det AP: matches a naive driver-side ranked-sweep recompute") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    // mutual-best matching at IoU >= 0.5 within (image, class)
    val pairs = for {
      g <- gts; p <- kept
      if g.img == p.img && g.cls == p.cls && iouD(g, p) >= 0.5
    } yield (g, p, iouD(g, p))
    val bp = pairs.groupBy(_._2.id).map { case (pid, ps) =>
      pid -> ps.minBy(t => (-t._3, t._1.id))._1.id }
    val bg = pairs.groupBy(_._1.id).map { case (gid, ps) =>
      gid -> ps.minBy(t => (-t._3, t._2.id))._2.id }
    val tp = bp.filter { case (p, g) => bg.get(g).contains(p) }.keySet
    // ranked sweep per class: cumulative precision, envelope, VOC2010 AP
    val expect = (0L to 2L).map { c =>
      val ranked = kept.filter(_.cls == c).sortBy(d => (-d.si, d.id))
      val nGt = gts.count(_.cls == c)
      val isTp = ranked.map(d => tp(d.id))
      val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
      val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
      val env = prec.scanRight(0.0)(math.max).init
      val ap = isTp.zip(env).filter(_._1).map(_._2).sum / nGt
      c -> ((nGt.toLong, ranked.size.toLong, cumTp.lastOption.getOrElse(0).toLong, ap))
    }.toMap
    val got = operators.RosbagDomainOps.detAveragePrecision(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    (0L to 2L).foreach { c =>
      val (eng, enp, entp, eap) = expect(c)
      val (gng, gnp, gntp, gap) = got(c)
      assert((gng, gnp, gntp) === ((eng, enp, entp)), s"class $c counts")
      // Spark's AP rides the DECIMAL(27,6) carrier (per-term 1e-6
      // rounding); the naive double sum is the reference within that
      assert(math.abs(gap - eap) < 1e-4, s"class $c ap: $gap vs $eap")
    }
    // mAP rollup row: totals + macro mean of the class APs
    val (mng, mnp, mntp, map) = got(-1L)
    assert(mng === expect.values.map(_._1).sum)
    assert(mnp === expect.values.map(_._2).sum)
    assert(mntp === expect.values.map(_._3).sum)
    val expMap = expect.values.map(_._4).sum / 3.0
    assert(math.abs(map - expMap) < 1e-4, s"mAP $map vs $expMap")
    assert(map > 0.0 && map < 1.0, "mAP must be a non-degenerate curve point")
  }

  test("q29e COCO mAP: per-(threshold, class) cells match a naive sweep; " +
    "rollup is the cell mean") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    def cell(ti: Int, c: Long): (Long, Long, Double) = {
      val thr = ti / 20.0
      val pairs = for {
        g <- gts; p <- kept
        if g.img == p.img && g.cls == p.cls && iouD(g, p) >= thr
      } yield (g, p, iouD(g, p))
      val bp = pairs.groupBy(_._2.id).map { case (pid, ps) =>
        pid -> ps.minBy(t => (-t._3, t._1.id))._1.id }
      val bg = pairs.groupBy(_._1.id).map { case (gid, ps) =>
        gid -> ps.minBy(t => (-t._3, t._2.id))._2.id }
      val tp = bp.filter { case (p, g) => bg.get(g).contains(p) }.keySet
      val ranked = kept.filter(_.cls == c).sortBy(d => (-d.si, d.id))
      val nGt = gts.count(_.cls == c)
      val isTp = ranked.map(d => tp(d.id))
      val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
      val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
      val env = prec.scanRight(0.0)(math.max).init
      val ap = isTp.zip(env).filter(_._1).map(_._2).sum / nGt
      (nGt.toLong, cumTp.lastOption.getOrElse(0).toLong, ap)
    }
    val got = operators.RosbagDomainOps.detApCoco(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size === 31) // 10 thresholds x 3 classes + rollup
    var cellApSum = 0.0
    for (ti <- 10 to 19; c <- 0L to 2L) {
      val (eng, entp, eap) = cell(ti, c)
      val (gng, gntp, gap) = got((ti / 20.0, c))
      assert(gng === eng && gntp === entp, s"ti=$ti class=$c counts")
      assert(math.abs(gap - eap) < 1e-4, s"ti=$ti class=$c ap: $gap vs $eap")
      cellApSum += gap
    }
    val (_, _, cocoMap) = got((-1.0, -1L))
    assert(math.abs(cocoMap - cellApSum / 30.0) < 1e-4,
      s"rollup $cocoMap vs cell mean ${cellApSum / 30.0}")
    // strict-localization arms must actually bite on this model
    val map50 = (0L to 2L).map(c => got((0.5, c))._3).sum / 3.0
    val map95 = (0L to 2L).map(c => got((0.95, c))._3).sum / 3.0
    assert(map95 < map50, s"0.95 arm ($map95) not stricter than 0.5 arm ($map50)")
    assert(cocoMap > 0.0 && cocoMap < map50)
  }

  test("q29f VOC07 11-point AP: matches a naive sample of the envelope; " +
    "distinct from the continuous integral on this curve") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    val pairs = for {
      g <- gts; p <- kept
      if g.img == p.img && g.cls == p.cls && iouD(g, p) >= 0.5
    } yield (g, p, iouD(g, p))
    val bp = pairs.groupBy(_._2.id).map { case (pid, ps) =>
      pid -> ps.minBy(t => (-t._3, t._1.id))._1.id }
    val bg = pairs.groupBy(_._1.id).map { case (gid, ps) =>
      gid -> ps.minBy(t => (-t._3, t._2.id))._2.id }
    val tp = bp.filter { case (p, g) => bg.get(g).contains(p) }.keySet
    // per class: envelope as in q29c, then BOTH interpolation modes
    val naive = (0L to 2L).map { c =>
      val ranked = kept.filter(_.cls == c).sortBy(d => (-d.si, d.id))
      val nGt = gts.count(_.cls == c)
      val isTp = ranked.map(d => tp(d.id))
      val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
      val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
      val env = prec.scanRight(0.0)(math.max).init
      val apCont = isTp.zip(env).filter(_._1).map(_._2).sum / nGt
      // VOC07: mean of the envelope sampled at recall = j/10 — the first
      // rank reaching that recall carries max prec over the suffix
      val ap11 = (0 to 10).map { j =>
        env.zip(cumTp).collect { case (e, ct) if ct * 10 >= j * nGt => e }
          .maxOption.getOrElse(0.0)
      }.sum / 11.0
      c -> ((ap11, apCont))
    }.toMap
    val got = operators.RosbagDomainOps.detAveragePrecisionVoc07(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    (0L to 2L).foreach { c =>
      assert(math.abs(got(c) - naive(c)._1) < 1e-9,
        s"class $c 11-point ap: ${got(c)} vs ${naive(c)._1}")
      // the arm must be a genuinely different metric on this curve —
      // otherwise the spec can't tell the modes apart
      assert(math.abs(naive(c)._1 - naive(c)._2) > 1e-6,
        s"class $c: 11-point equals continuous — degenerate curve")
    }
    val exp11Map = naive.values.map(_._1).sum / 3.0
    assert(math.abs(got(-1L) - exp11Map) < 1e-6, s"mAP ${got(-1L)} vs $exp11Map")
    // on a sawtooth PR curve the coarse 11-point sample reads the
    // envelope only at its plateaus — pin the direction vs continuous
    val expContMap = naive.values.map(_._2).sum / 3.0
    assert((got(-1L) > expContMap) === (exp11Map > expContMap))
  }

  test("q29g COCO-greedy mAP: matches a naive sequential assignment sweep; " +
    "kernel fuzzed against a reference loop") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    // naive greedy per (ti, image, class): score-order claim of the best
    // free GT — the pycocotools loop, written independently of the kernel
    def greedyTp(thr: Double): Set[Long] = {
      kept.groupBy(d => (d.img, d.cls)).flatMap { case ((img, cls), ds) =>
        val gs = gts.filter(g => g.img == img && g.cls == cls)
        val used = scala.collection.mutable.HashSet.empty[Long]
        ds.sortBy(d => (-d.si, d.id)).flatMap { p =>
          val free = gs.filter(g => !used.contains(g.id) && iouD(g, p) >= thr)
          if (free.isEmpty) None
          else {
            val best = free.minBy(g => (-iouD(g, p), g.id))
            used += best.id
            Some(p.id)
          }
        }
      }.toSet
    }
    def cellAp(tp: Set[Long], c: Long): (Long, Double) = {
      val ranked = kept.filter(_.cls == c).sortBy(d => (-d.si, d.id))
      val nGt = gts.count(_.cls == c)
      val isTp = ranked.map(d => tp(d.id))
      val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
      val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
      val env = prec.scanRight(0.0)(math.max).init
      (cumTp.lastOption.getOrElse(0).toLong,
        isTp.zip(env).filter(_._1).map(_._2).sum / nGt)
    }
    val got = operators.RosbagDomainOps.detApCocoGreedy(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1)) -> ((r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.size === 31)
    var apSum = 0.0
    for (ti <- 10 to 19; c <- 0L to 2L) {
      val tp = greedyTp(ti / 20.0)
      val (entp, eap) = cellAp(tp, c)
      val (gntp, gap) = got((ti / 20.0, c))
      assert(gntp === entp, s"ti=$ti class=$c n_tp: $gntp vs $entp")
      assert(math.abs(gap - eap) < 1e-4, s"ti=$ti class=$c ap: $gap vs $eap")
      apSum += gap
    }
    assert(math.abs(got((-1.0, -1L))._2 - apSum / 30.0) < 1e-4)
    // the documented matching-rule relation, PINNED ON THIS MODEL (an
    // empirical gate-lake pin, not a theorem): greedy matches at least as
    // many detections per cell as mutual-best here — a det whose best GT
    // is claimed can still take a lower-IoU free GT
    val mutual = operators.RosbagDomainOps.detApCoco(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1)) -> r.getLong(4)).toMap
    for (ti <- 10 to 19; c <- 0L to 2L)
      assert(got((ti / 20.0, c))._1 >= mutual((ti / 20.0, c)),
        s"ti=$ti class=$c: greedy matched fewer than mutual-best")

    // kernel fuzz: greedyMatchGroup == the reference loop on random groups
    val rng = new scala.util.Random(11)
    (1 to 50).foreach { trial =>
      val nGt = 1 + rng.nextInt(5); val nPred = 1 + rng.nextInt(8)
      val cands = for {
        g <- 0 until nGt; p <- 0 until nPred
        if rng.nextBoolean()
      } yield (g.toLong, 100L + p, rng.nextInt(100) / 100.0, (rng.nextInt(50) * 20).toLong)
      // si must be constant per pred
      val siOf = (0 until nPred).map(p => 100L + p -> (rng.nextInt(1000).toLong)).toMap
      val fixed = cands.map { case (g, p, iou, _) => (g, p, iou, siOf(p)) }
      val expect = {
        val used = scala.collection.mutable.HashSet.empty[Long]
        fixed.map(_._2).distinct.sortBy(p => (-siOf(p), p)).flatMap { p =>
          val free = fixed.filter(t => t._2 == p && !used.contains(t._1))
          if (free.isEmpty) None
          else { val b = free.minBy(t => (-t._3, t._1)); used += b._1; Some(p) }
        }
      }
      val gotK = operators.RosbagDomainOps.greedyMatchGroup(fixed.toArray)
      assert(gotK.toSet === expect.toSet, s"trial $trial: $gotK vs $expect")
    }
  }

  test("q29h VOC07-greedy AP: 11-point interpolation over the GREEDY TP set; " +
    "both dials verified to bite independently on this model") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    // naive greedy assignment at thr 0.5 (the q29g reference loop)
    val tp: Set[Long] = kept.groupBy(d => (d.img, d.cls)).flatMap { case ((img, cls), ds) =>
      val gs = gts.filter(g => g.img == img && g.cls == cls)
      val used = scala.collection.mutable.HashSet.empty[Long]
      ds.sortBy(d => (-d.si, d.id)).flatMap { p =>
        val free = gs.filter(g => !used.contains(g.id) && iouD(g, p) >= 0.5)
        if (free.isEmpty) None
        else { val b = free.minBy(g => (-iouD(g, p), g.id)); used += b.id; Some(p.id) }
      }
    }.toSet
    // 11-point AP over the greedy TP set (the q29f envelope device)
    val naive = (0L to 2L).map { c =>
      val ranked = kept.filter(_.cls == c).sortBy(d => (-d.si, d.id))
      val nGt = gts.count(_.cls == c)
      val isTp = ranked.map(d => tp(d.id))
      val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
      val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
      val env = prec.scanRight(0.0)(math.max).init
      val ap11 = (0 to 10).map { j =>
        env.zip(cumTp).collect { case (e, ct) if ct * 10 >= j * nGt => e }
          .maxOption.getOrElse(0.0)
      }.sum / 11.0
      c -> ap11
    }.toMap
    val got = operators.RosbagDomainOps.detAveragePrecisionVoc07Greedy(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    (0L to 2L).foreach { c =>
      assert(math.abs(got(c)._2 - naive(c)) < 1e-9,
        s"class $c VOC07-greedy ap: ${got(c)._2} vs ${naive(c)}")
    }
    assert(math.abs(got(-1L)._2 - naive.values.sum / 3.0) < 1e-6)
    // both dials must bite, or the exact-reproduction claim is vacuous:
    // (a) the INTERPOLATION dial — vs q29g's ti=10 cells (same greedy TP
    // set, continuous integral) the AP values differ;
    val g10 = operators.RosbagDomainOps.detApCocoGreedy(spark, sf).collect()
      .filter(r => r.getDouble(0) == 0.5)
      .map(r => r.getLong(1) -> ((r.getLong(4), r.getDouble(5)))).toMap
    (0L to 2L).foreach { c =>
      assert(got(c)._1 === g10(c)._1,
        s"class $c: q29h TP count differs from q29g's ti=10 cell under the SAME rule")
    }
    assert((0L to 2L).exists(c => math.abs(got(c)._2 - g10(c)._2) > 1e-6),
      "11-point never diverged from continuous — dial unverified")
    // (b) the MATCHING dial — on the gate model the two rules coincide at
    // EVERY threshold (the q29g >= pin is an equality throughout), so the
    // dial is pinned at the kernel level with the canonical divergence
    // case: det A (higher score) best-overlaps GT1 but GT1's best partner
    // is det B — greedy lets A claim GT1 and B fall through to GT2
    // (2 TPs), while mutual-best matches only B-GT1 (1 TP).
    val div = Array(
      (1L, 100L, 0.90, 900L), (2L, 100L, 0.60, 900L), // A: GT1 0.90, GT2 0.60
      (1L, 101L, 0.95, 800L), (2L, 101L, 0.55, 800L)) // B: GT1 0.95, GT2 0.55
    val greedyTps = operators.RosbagDomainOps.greedyMatchGroup(div).toSet
    val mutualTps = {
      val bp = div.groupBy(_._2).map { case (p, xs) =>
        p -> xs.minBy(t => (-t._3, t._1))._1 }
      val bg = div.groupBy(_._1).map { case (g, xs) =>
        g -> xs.minBy(t => (-t._3, t._2))._2 }
      bp.filter { case (p, g) => bg.get(g).contains(p) }.keySet
    }
    assert(mutualTps === Set(101L), s"mutual-best mini-loop drifted: $mutualTps")
    assert(greedyTps === Set(100L, 101L),
      s"greedy must match BOTH dets on the divergence case; got $greedyTps")
  }

  test("q29i COCO scoreboard: matches a naive pycocotools-style driver sweep " +
    "(area-ignore greedy matching, maxDets truncation); area bins partition " +
    "n_gt; AR monotone in maxDets; (all,100) cells equal q29g's") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    def binOf(area: Long): Long = if (area < 1024) 1L else if (area < 9216) 2L else 3L
    def inBin(ab: Long, area: Long): Boolean = ab == 0L || binOf(area) == ab
    val combos = Seq((0L, 1L), (0L, 10L), (0L, 100L), (1L, 100L), (2L, 100L), (3L, 100L))
    // every area bin must be POPULATED on this model or the sweep is vacuous
    (0L to 3L).foreach { ab =>
      assert(gts.exists(g => inBin(ab, g.w * g.h)), s"area bin $ab empty — model degenerate")
    }
    // naive cells: per (ti, combo) one ignore-aware greedy pass, then
    // per-class PR — written independently of the kernel and the plan
    val cells = (for {
      ti <- 10 to 19
      (ab, md) <- combos
    } yield {
      val thr = ti / 20.0
      val truncated = kept.groupBy(d => (d.img, d.cls)).values.flatMap { ds =>
        ds.sortBy(d => (-d.si, d.id)).take(md.toInt)
      }.toSeq
      val matchedIg = scala.collection.mutable.Map.empty[Long, Boolean]
      truncated.groupBy(d => (d.img, d.cls)).foreach { case ((img, cls), ds) =>
        val gs = gts.filter(g => g.img == img && g.cls == cls)
        val used = scala.collection.mutable.HashSet.empty[Long]
        ds.sortBy(d => (-d.si, d.id)).foreach { p =>
          val free = gs.filter(g => !used.contains(g.id) && iouD(g, p) >= thr)
          if (free.nonEmpty) {
            // pycocotools pick: best free non-ignored gt, else best ignored
            val best = free.minBy(g =>
              (if (inBin(ab, g.w * g.h)) 0 else 1, -iouD(g, p), g.id))
            used += best.id
            matchedIg(p.id) = !inBin(ab, best.w * best.h)
          }
        }
      }
      (0L to 2L).flatMap { c =>
        val nGt = gts.count(g => g.cls == c && inBin(ab, g.w * g.h))
        if (nGt == 0) None
        else {
          val ranked = truncated.filter(_.cls == c)
            .filter(d => matchedIg.get(d.id) match {
              case Some(ig) => !ig                 // matched-to-ignored: out
              case None     => inBin(ab, d.w * d.h) // unmatched out-of-range: out
            })
            .sortBy(d => (-d.si, d.id))
          val isTp = ranked.map(d => matchedIg.get(d.id).contains(false))
          val cumTp = isTp.scanLeft(0)((a, t) => a + (if (t) 1 else 0)).tail
          val prec = cumTp.zipWithIndex.map { case (ct, i) => ct.toDouble / (i + 1) }
          val env = prec.scanRight(0.0)(math.max).init
          val nTp = cumTp.lastOption.getOrElse(0)
          // pycocotools' 101-point interpolation, recomputed naively
          val ap101 = (0 to 100).map { j =>
            env.zip(cumTp).collect { case (e, ct) if ct * 100 >= j * nGt => e }
              .maxOption.getOrElse(0.0)
          }.sum / 101.0
          Some((ti.toLong, ab, md, c) ->
            ((nTp.toLong, ap101, nTp.toDouble / nGt)))
        }
      }
    }).flatten.toMap
    def mean(vs: Iterable[Double]) = vs.sum / vs.size
    def cellsOf(ab: Long, md: Long, tiOnly: Option[Long] = None) =
      cells.collect { case ((ti, a, m, _), v) if a == ab && m == md &&
        tiOnly.forall(_ == ti) => v }
    val expect = Map(
      1L -> mean(cellsOf(0, 100).map(_._2)),
      2L -> mean(cellsOf(0, 100, Some(10)).map(_._2)),
      3L -> mean(cellsOf(0, 100, Some(15)).map(_._2)),
      4L -> mean(cellsOf(1, 100).map(_._2)),
      5L -> mean(cellsOf(2, 100).map(_._2)),
      6L -> mean(cellsOf(3, 100).map(_._2)),
      7L -> mean(cellsOf(0, 1).map(_._3)),
      8L -> mean(cellsOf(0, 10).map(_._3)),
      9L -> mean(cellsOf(0, 100).map(_._3)),
      10L -> mean(cellsOf(1, 100).map(_._3)),
      11L -> mean(cellsOf(2, 100).map(_._3)),
      12L -> mean(cellsOf(3, 100).map(_._3)))
    val got = operators.RosbagDomainOps.detCocoScoreboard(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === (1L to 12L).toSet)
    expect.foreach { case (no, e) =>
      assert(math.abs(got(no)._3 - e) < 1e-4,
        s"metric ${got(no)._1}: ${got(no)._3} vs naive $e")
    }
    // structural pins:
    // (a) the area bins PARTITION the gt set per class
    (0L to 2L).foreach { c =>
      val all = gts.count(_.cls == c)
      val parts = (1L to 3L).map(ab => gts.count(g => g.cls == c && inBin(ab, g.w * g.h)))
      assert(parts.sum === all, s"class $c: bins don't partition ($parts vs $all)")
    }
    // (b) the maxDets budget is monotone: truncation only removes the
    // ranked TAIL, so the matched set can only grow — recall at 1 <= 10
    // <= 100 cell by cell, and so the AR metrics in aggregate
    for (ti <- 10L to 19L; c <- 0L to 2L) {
      val r1 = cells((ti, 0L, 1L, c))._3
      val r10 = cells((ti, 0L, 10L, c))._3
      val r100 = cells((ti, 0L, 100L, c))._3
      assert(r1 <= r10 + 1e-12 && r10 <= r100 + 1e-12, s"ti=$ti c=$c: recall not monotone")
    }
    assert(got(7L)._3 <= got(8L)._3 + 1e-12 && got(8L)._3 <= got(9L)._3 + 1e-12)
    // (c) on the full range nothing is ignored and no group exceeds 100
    // detections, so q29i's (all, 100) matching IS q29g's sweep: the TP
    // counts agree cell by cell (the interpolation mode differs BY
    // DESIGN — q29i is 101-point pycocotools, q29g the continuous
    // integral — so the relation pins at the interpolation-free level)
    val g29 = operators.RosbagDomainOps.detApCocoGreedy(spark, sf).collect()
      .filter(_.getLong(1) >= 0L)
      .map(r => (math.round(r.getDouble(0) * 20), r.getLong(1)) -> r.getLong(4)).toMap
    for (ti <- 10L to 19L; c <- 0L to 2L)
      assert(cells((ti, 0L, 100L, c))._1 === g29((ti, c)),
        s"ti=$ti c=$c: (all,100) TP count drifted from q29g's cell")

    // kernel fuzz: greedyMatchGroupIgnore == the reference pick on random
    // groups with random ignore flags; ignore-blind inputs reduce to
    // greedyMatchGroup
    val rng = new scala.util.Random(13)
    (1 to 50).foreach { trial =>
      val nGt = 1 + rng.nextInt(5); val nPred = 1 + rng.nextInt(8)
      val gig = (0 until nGt).map(g => g.toLong -> rng.nextBoolean()).toMap
      val siOf = (0 until nPred).map(p => 100L + p -> rng.nextInt(1000).toLong).toMap
      val cands = for {
        g <- 0 until nGt; p <- 0 until nPred
        if rng.nextBoolean()
      } yield (g.toLong, 100L + p, rng.nextInt(100) / 100.0, siOf(100L + p), gig(g.toLong))
      val expectK = {
        val used = scala.collection.mutable.HashSet.empty[Long]
        cands.map(_._2).distinct.sortBy(p => (-siOf(p), p)).flatMap { p =>
          val free = cands.filter(t => t._2 == p && !used.contains(t._1))
          if (free.isEmpty) None
          else {
            val b = free.minBy(t => (if (t._5) 1 else 0, -t._3, t._1))
            used += b._1
            Some((p, b._5))
          }
        }
      }
      val gotK = operators.RosbagDomainOps.greedyMatchGroupIgnore(cands.toArray)
      assert(gotK.toSet === expectK.toSet, s"trial $trial: $gotK vs $expectK")
      val blind = cands.map { case (g, p, iou, si, _) => (g, p, iou, si, false) }
      assert(operators.RosbagDomainOps.greedyMatchGroupIgnore(blind.toArray)
        .map(_._1).toSet ===
        operators.RosbagDomainOps.greedyMatchGroup(
          cands.map { case (g, p, iou, si, _) => (g, p, iou, si) }.toArray).toSet,
        s"trial $trial: ignore-blind kernel drifted from greedyMatchGroup")
    }
  }

  test("q29j class-confusion matrix: matches a naive class-agnostic mutual-best " +
    "recompute; every gt and every kept detection lands in exactly one row") {
    val (gts, dets) = naiveModel()
    val kept = naiveNms(dets)
    // naive class-AGNOSTIC mutual-best matching at IoU >= 0.5, written
    // independently: best-by-(iou desc, id) in both directions, within image
    val pairs = for {
      g <- gts; p <- kept
      if g.img == p.img && iouD(g, p) >= 0.5
    } yield (g, p, iouD(g, p))
    val bestForPred = pairs.groupBy(_._2.id).map { case (pid, xs) =>
      pid -> xs.minBy(t => (-t._3, t._1.id))._1.id }
    val bestForGt = pairs.groupBy(_._1.id).map { case (gid, xs) =>
      gid -> xs.minBy(t => (-t._3, t._2.id))._2.id }
    val matched = pairs.collect {
      case (g, p, _) if bestForPred.get(p.id).contains(g.id) &&
        bestForGt.get(g.id).contains(p.id) => (g, p)
    }
    val expect = (matched.groupBy { case (g, p) => (g.cls, p.cls) }
      .map { case (k, xs) => k -> xs.size.toLong }) ++
      gts.filterNot(g => matched.exists(_._1.id == g.id))
        .groupBy(g => (g.cls, -1L)).map { case (k, xs) => k -> xs.size.toLong } ++
      kept.filterNot(p => matched.exists(_._2.id == p.id))
        .groupBy(p => (-1L, p.cls)).map { case (k, xs) => k -> xs.size.toLong }
    val got = operators.RosbagDomainOps.detConfusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect, s"confusion drifted:\n got   $got\n naive $expect")
    // conservation: margins + matrix partition the gt and kept-det sets
    assert(got.filterKeys(_._1 >= 0).values.sum === gts.size.toLong,
      "every gt must land in exactly one row (matrix + missed margin)")
    assert(got.filterKeys(_._2 >= 0).values.sum === kept.size.toLong,
      "every kept det must land in exactly one row (matrix + background margin)")
    // the operator's reason to exist: off-diagonal mass is visible here
    // while the per-(image, class) metrics (q29b..q29i) structurally
    // cannot produce it — assert this model actually confuses classes
    assert(got.exists { case ((g, p), n) => g >= 0 && p >= 0 && g != p && n > 0 },
      "no off-diagonal confusion on the gate model — test vacuous")
  }

  test("q29c/q29e leave zero cache entries behind (apSweepCells lifecycle)") {
    // the AP sweep persists the NMS output internally (it feeds both the
    // matching join and the ranked sweep); a long-lived session calling
    // the AP queries repeatedly must not accumulate cache entries — the
    // bounded cell table is materialized and every persist released
    val before = spark.sparkContext.getPersistentRDDs.size
    operators.RosbagDomainOps.detAveragePrecision(spark, sf).collect()
    operators.RosbagDomainOps.detApCoco(spark, sf).collect()
    operators.RosbagDomainOps.detAveragePrecision(spark, sf).collect()
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "repeated AP-sweep calls accumulated persisted RDDs")
  }
}
