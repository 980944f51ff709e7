package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clf, ClfWeights}

/** Quality classifier (q94/q95): partitioning-invariant training,
  * separation on the proxy task, scoring contract.
  */
class ClfSpec extends SparkSpec {

  test("train is bit-identical under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Clf.train(spark, docs, rounds = 4)
    val b = Clf.train(spark, docs.repartition(7), rounds = 4)
    assert(a.bias === b.bias)
    assert(a.weights === b.weights)
  }

  test("trained model separates the reference source from the background") {
    val docs = Tables.documents(spark, sf)
    val m = Clf.train(spark, docs)
    val scored = Clf.scoreOf(docs, m, ClfWeights.Buckets)
      .select(col("source"), col("logit"))
      .collect()
    val (ref, rest) = scored.partition(_.getString(0) == ClfWeights.RefSource)
    assert(ref.nonEmpty && rest.nonEmpty)
    val mRef = ref.map(_.getDouble(1)).sum / ref.length
    val mRest = rest.map(_.getDouble(1)).sum / rest.length
    assert(mRef > mRest,
      s"no separation: ref mean $mRef vs background mean $mRest")
    // the logit-0 threshold must be a usable operating point on the
    // training task, not just a rank ordering
    val acc = scored.count(r =>
      (r.getDouble(1) > 0) == (r.getString(0) == ClfWeights.RefSource)
    ).toDouble / scored.length
    assert(acc >= 0.6, s"training accuracy $acc below 0.6")
  }

  test("scoring contract: one row per doc with features, keep = logit > 0") {
    val docs = Tables.documents(spark, sf)
    val m = Clf.train(spark, docs, rounds = 2)
    val scored = Clf.scoreOf(docs, m, ClfWeights.Buckets).collect()
    val nDocs = docs
      .filter(size(expr("filter(split(text, ' '), x -> x <> '')")) > 0)
      .count()
    assert(scored.length.toLong === nDocs)
    scored.foreach { r =>
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
      assert(r.getInt(4) === (if (r.getDouble(3) > 0) 1 else 0))
      assert(r.getLong(2) > 0L)
    }
  }

  test("frozen artifact invariants: bucket range, finite weights") {
    assert(ClfWeights.values.forall { case (b, w) =>
      b >= 0 && b < ClfWeights.Buckets && !w.isNaN && !w.isInfinite
    })
    assert(!ClfWeights.Bias.isNaN && !ClfWeights.Bias.isInfinite)
    assert(graft.operators.ClfWeightsSampled.values.forall { case (b, w) =>
      b >= 0 && b < ClfWeights.Buckets && !w.isNaN && !w.isInfinite
    })
    assert(!graft.operators.ClfWeightsSampled.Bias.isNaN)
  }

  test("q95d calibration: bins partition the scored corpus; rollup gap IS " +
    "the population-weighted ECE; confidences live in their own decile") {
    val rows = Clf.calibrationTable(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val bins = rows.filter(_._1 >= 0)
    val (totN, totRef, _, totRefRate, ece) = rows(-1L)
    // partition: bin doc counts sum to the rollup's corpus total, which
    // equals the scoring contract's row count
    assert(bins.values.map(_._1).sum === totN)
    assert(bins.values.map(_._2).sum === totRef)
    val scoredN = Clf.scoreOf(Tables.documents(spark, sf), Clf.frozen,
      ClfWeights.Buckets).count()
    assert(totN === scoredN)
    assert(math.abs(totRefRate - totRef.toDouble / totN) < 1e-12)
    // each bin's mean confidence lies inside its own decile, and its
    // ref_rate is a probability
    bins.foreach { case (b, (n, nr, mc, rr, gap)) =>
      assert(mc >= b / 10.0 - 1e-9 && mc < (b + 1) / 10.0 + 1e-9, s"bin $b conf $mc")
      assert(rr >= 0.0 && rr <= 1.0 && nr <= n)
      assert(math.abs(gap - math.abs(mc - rr)) < 1e-12)
    }
    // the rollup's gap is exactly the population-weighted mean of bin
    // gaps (ECE), within the decimal carrier's per-term rounding
    val expEce = bins.values.map { case (n, _, _, _, g) => n * g }.sum / totN
    assert(math.abs(ece - expEce) < 1e-5, s"ece $ece vs $expEce")
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("q94b sampled trainer: trains on all ref docs + sampled background, " +
    "scores the FULL lake within an AUC margin of the full trainer") {
    val docs = Tables.documents(spark, sf)
    val frac = graft.operators.ClfWeightsSampled.SampleFrac
    val trainSet = Clf.sampledTrainSet(docs, frac)
    // stratification contract: every reference doc survives; the
    // background shrinks to ~frac
    val nRef = docs.filter(col("source") === ClfWeights.RefSource).count()
    assert(trainSet.filter(col("source") === ClfWeights.RefSource).count() === nRef)
    val nBg = docs.filter(col("source") =!= ClfWeights.RefSource).count()
    val nBgSampled = trainSet.filter(col("source") =!= ClfWeights.RefSource).count()
    assert(nBgSampled < nBg && nBgSampled > 0)
    // rank-AUC of a model scoring the FULL lake (what q94b exists for:
    // train cheap, score everything)
    def aucOf(m: Clf.Model): Double = {
      val scored = Clf.scoreOf(docs, m, ClfWeights.Buckets)
        .select("source", "logit").collect()
      val (ref, rest) = scored.partition(_.getString(0) == ClfWeights.RefSource)
      val rs = ref.map(_.getDouble(1)); val bs = rest.map(_.getDouble(1))
      rs.map(r => bs.count(_ < r) + 0.5 * bs.count(_ == r)).sum /
        (rs.length.toDouble * bs.length)
    }
    val sampled = Clf.train(spark, trainSet)
    val full = Clf.frozen // the committed full-train artifact
    val aucS = aucOf(sampled)
    val aucF = aucOf(full)
    // the freeze evidence: sampled-training costs ~frac of a round but
    // gives up at most this much full-lake ranking quality
    assert(aucS >= aucF - 0.08, s"sampled AUC $aucS vs full $aucF")
    assert(aucS > 0.7, s"sampled AUC $aucS not a usable ranker")
  }

  test("q95b threshold curve: monotone keep counts, rates in [0,1], " +
    "threshold-0 row equals q95's calibrated verdict") {
    val curve = Clf.thresholdCurve(spark, sf).collect()
    assert(curve.length === Clf.CurveThresholds.length)
    // the threshold column comes back sorted; keep volume can only fall
    // as the cut rises, and every row sees the same corpus
    val thresholds = curve.map(_.getDouble(0)).toSeq
    assert(thresholds === Clf.CurveThresholds.sorted)
    val nDocs = curve.map(_.getLong(1)).distinct
    assert(nDocs.length === 1)
    val keeps = curve.map(_.getLong(2)).toSeq
    assert(keeps === keeps.sorted.reverse, s"n_keep not non-increasing: $keeps")
    curve.foreach { r =>
      Seq(3, 4, 5).foreach { i =>
        if (!r.isNullAt(i)) assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
      }
    }
    // the middle row IS q95: same corpus, same model, cut at logit 0
    val q95Keep = Clf.scoreTable(spark, sf)
      .agg(sum(col("keep"))).collect()(0).getLong(0)
    val zeroRow = curve.find(_.getDouble(0) == 0.0).get
    assert(zeroRow.getLong(2) === q95Keep)
  }

  test("q95c eval: rank-based AUC matches the freeze diagnostic's wins formula; " +
    "threshold metrics agree with q95") {
    val r = Clf.evalTable(spark, sf).collect()(0)
    // driver-side recompute with the EXACT formula jobs.ClfTrain froze
    // its diagnostics with: wins = Σ₊ (#neg below + 0.5·#neg tied)
    val scored = Clf.scoreTable(spark, sf).select("source", "logit").collect()
    val (ref, rest) = scored.partition(_.getString(0) == graft.operators.ClfWeights.RefSource)
    val rs = ref.map(_.getDouble(1)); val bs = rest.map(_.getDouble(1))
    val wins = rs.map(x => bs.count(_ < x) + 0.5 * bs.count(_ == x)).sum
    val aucRef = wins / (rs.length.toDouble * bs.length)
    assert(r.getLong(0) === scored.length.toLong)      // n_docs
    assert(r.getLong(1) === rs.length.toLong)          // n_pos
    assert(r.getLong(2) === bs.length.toLong)          // n_neg
    assert(math.abs(r.getDouble(5) - aucRef) < 1e-9, s"auc ${r.getDouble(5)} vs $aucRef")
    // the calibrated-threshold row agrees with q95's verdicts exactly
    val nKeep = scored.count(_.getDouble(1) > 0).toLong
    val tp = ref.count(_.getDouble(1) > 0).toLong
    assert(r.getLong(3) === nKeep)
    assert(r.getLong(4) === tp)
    assert(r.getDouble(7) === tp.toDouble / rs.length) // recall
    // the freeze bar lives on the GATE lake (the corpus the artifact was
    // trained and diagnosed on — this suite's sf is a different, tiny
    // lake where near-chance AUC is expected): AUC must clear chance
    // decisively there, or the frozen artifact has drifted from its
    // documented diagnostics
    val gate = Clf.evalTable(spark, "/root/testdata/sf0.01").collect()(0)
    assert(gate.getDouble(5) > 0.8, s"frozen classifier AUC degraded: ${gate.getDouble(5)}")
    assert(gate.getDouble(7) > 0.5, s"reference recall degraded: ${gate.getDouble(7)}")
  }

  test("trainers reproduce the frozen ClfWeights/ClfWeightsSampled on the " +
    "gate lake bit-exactly") {
    // the kernel-vs-carrier equivalence pinned IN CI, not only by
    // driver-side oracle runs (advisor finding, round 16): the
    // treeAggregate trainer must reproduce the frozen artifacts — which
    // the replaced Catalyst formulation produced — to the last bit,
    // bias included, on the lake they were trained on
    val gate = "/root/testdata/sf0.01"
    val full = Clf.trainTable(spark, gate)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val fullExp = ((-1L, graft.operators.ClfWeights.Bias) +:
      graft.operators.ClfWeights.values.map { case (b, x) => (b.toLong, x) })
      .sortBy(_._1)
    assert(full.toSeq === fullExp)
    val sampled = Clf.trainTableSampled(spark, gate)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sampledExp = ((-1L, graft.operators.ClfWeightsSampled.Bias) +:
      graft.operators.ClfWeightsSampled.values.map { case (b, x) => (b.toLong, x) })
      .sortBy(_._1)
    assert(sampled.toSeq === sampledExp)
  }
}
