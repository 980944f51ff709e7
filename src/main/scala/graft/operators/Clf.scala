package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** Distributed model-based quality classifier — the fastText-style linear
  * filter every large-scale pretraining pipeline runs after the rule-based
  * gates (GPT-3's WebText-vs-crawl logistic regression, LLaMA's Wikipedia
  * -reference classifier, CCNet's companion to the LM filter): a logistic
  * model over hashed unigram+bigram bag-of-words features, trained to
  * discriminate the clean REFERENCE source from the crawl background, then
  * applied to score every document. Complements q90 (generative LM score)
  * and q91 (importance ratio of two count models) with the DISCRIMINATIVE
  * member of the family — the only one of the three that optimizes
  * separation directly.
  *
  * Training is full-batch gradient ascent on the log-likelihood, expressed
  * as the Kmeans/Bpe/Pca bounded-iteration pattern: per round ONE broadcast
  * join of the persisted feature table against the ≤B-row weight vector,
  * one per-doc aggregation (the dot products), one per-bucket aggregation
  * (the gradient), and a driver-side update of B+1 doubles. The feature
  * table is built once (one corpus pass); every round is feature-table
  * -sized, never corpus-text-sized. At 100 TB the weight vector is B
  * doubles BY CONSTRUCTION — always the broadcast side.
  *
  * Bit-stable by construction, which is what lets the frozen artifact BE
  * the oracle: the squashing function is the ALGEBRAIC sigmoid
  * σ(z) = 0.5 + 0.5·z/(1+|z|) — one fixed IEEE chain of +,×,÷,|·| with no
  * transcendental calls, so scores cannot drift by a libm ulp across
  * engines or platforms (same monotone S-shape onto (0,1); gradient ascent
  * with err = y − σ(z) is then exact gradient ascent on the matching
  * proper composite loss). Every cross-row reduction (per-doc dot,
  * per-bucket gradient, bias gradient) rides the exact-decimal carrier,
  * and the driver update is a fixed IEEE chain — a retrain on the same
  * lake reproduces [[ClfWeights]] bit-for-bit under ANY partitioning.
  */
object Clf extends Serializable {

  /** A trained model: intercept + sparse bucket weights (untouched
    * buckets are implicitly 0). */
  final case class Model(bias: Double, weights: Seq[(Int, Double)])

  /** The frozen model as a (feature, weight) frame: feature −1 is the
    * bias, features 0..B−1 the hashed buckets. */
  private def modelDf(s: SparkSession, m: Model): DataFrame = {
    import s.implicits._
    m.weights.toDF("b", "w")
  }

  /** Spark's non-ANSI Cast(double → decimal(27,6)) reproduced on the raw
    * value — the EXACT carrier conversion every Exact.dsum addend goes
    * through (Decimal(double) is the Double.toString/HALF_UP path;
    * changePrecision(27,6) is the overflow-to-null gate). Returning null
    * mirrors the cast's null-on-overflow, which sum() then skips. */
  private def exactAcc(x: Double): java.math.BigDecimal =
    try {
      val d = org.apache.spark.sql.types.Decimal(x)
      if (d.changePrecision(27, 6)) d.toJavaBigDecimal else null
    } catch { case _: NumberFormatException => null } // NaN/Infinity → null

  /** Train `rounds` of full-batch gradient ascent over `docs`'s hashed
    * n-gram features, label y = (source == refSource). Returns the model;
    * deterministic for a fixed lake (see object doc).
    *
    * Round-16 optimization (guide §1.2 step 1 — fix the distributed
    * algorithm before the per-task work): the round loop runs as ONE
    * `treeAggregate` job per round over a doc-major cached RDD — the
    * Kmeans/Pq trainer idiom — instead of a per-round Catalyst query
    * (broadcast join + two aggregations + a co-partitioned self-join).
    * The per-round DataFrame formulation re-planned and re-COMPILED its
    * stages every round (the round's `lit(bias)` is embedded in the
    * generated code, so whole-stage codegen can never cache-hit across
    * rounds) and materialized ~5 AQE query stages per round: measured
    * 17.3 s wall / 234 process-CPU-s at sf0.1·local[32] for 33 rounds of
    * a 1.4k-doc sample — all latency and driver work, not data. The
    * kernel keeps the math BIT-IDENTICAL (pinned by the frozen
    * ClfWeights/ClfWeightsSampled oracles and ClfSpec's repartition
    * determinism spec): every cross-row reduction accumulates the same
    * decimal(27,6) addends ([[exactAcc]] IS the Cast the carrier
    * applied), exact decimal addition is order-insensitive, and the
    * per-doc σ/err chain is the identical IEEE expression tree.
    *
    * 100 TB shape: unchanged or better — the features pass and the
    * doc-major grouping are one corpus scan + one shuffle (as before);
    * each round then moves only the B-double weight broadcast out and
    * ≤(B+1) exact-decimal partials per partition back through
    * treeAggregate's log-depth merge, where the DataFrame loop shuffled
    * a ≤B-row gradient exchange AND round-tripped the driver ~5× per
    * round. Per-partition state is one B-slot array; docs stream. */
  def train(s: SparkSession, docs: DataFrame,
      buckets: Int = ClfWeights.Buckets,
      rounds: Int = ClfWeights.Rounds,
      lr: Double = ClfWeights.LearningRate,
      refSource: String = ClfWeights.RefSource): Model = {
    require(rounds >= 1 && rounds <= 1024, s"rounds in [1,1024]; got $rounds")
    // ONE featurization pass + ONE doc-major grouping: each doc collapses
    // to (y, n, bs[], ks[]) — the only shape the per-round math reads.
    // collect_list order is partition-dependent, which is safe by the
    // same argument as the old formulation's arbitrary row order: every
    // consumer is an exact-decimal (order-insensitive) reduction.
    val docRows = CurationOps.hashedNgramFeats(docs, buckets)
      .withColumn("y", when(col("source") === refSource, 1.0).otherwise(0.0))
      .groupBy("doc_id", "y")
      .agg(sum(col("k")).as("n"),
        collect_list(struct(col("b"), col("k"))).as("fs"))
      .select(col("y"), col("n"), col("fs.b").as("bs"), col("fs.k").as("ks"))
    val rdd = docRows.rdd.map { r =>
      (r.getDouble(0), r.getLong(1),
        r.getSeq[Long](2).toArray, r.getSeq[Long](3).toArray)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // class-BALANCED mean gradients (the GPT-3-style classifier trains
      // reference-vs-crawl where positives are a sliver of the corpus):
      // each doc carries weight N/(2·N_class), so both classes pull
      // equally and the step size is corpus-size-INDEPENDENT — the same
      // lr/rounds dial works at sf0.001 and at 100 TB. One tiny count
      // pass up front (doubles as the cache materialization).
      val (nPos, nNeg) = rdd.treeAggregate((0L, 0L))(
        (a, d) => if (d._1 == 1.0) (a._1 + 1L, a._2) else (a._1, a._2 + 1L),
        (a, b) => (a._1 + b._1, a._2 + b._2))
      require(nPos > 0 && nNeg > 0,
        s"need both classes to train: $nPos docs of '$refSource', $nNeg others")
      val n = (nPos + nNeg).toDouble
      val cwPos = n / (2.0 * nPos)
      val cwNeg = n / (2.0 * nNeg)
      // Right-size the loop's parallelism to the TRAINING SET, not to the
      // corpus scan that produced it (the propagateMin device): a small
      // sample leaves most of the groupBy's partitions holding a handful
      // of docs, and 32 rounds × 32 near-empty tasks is pure scheduling
      // latency. The narrowing is a LAZY coalesce over the persisted
      // blocks (no second copy, no shuffle); at 100 TB the doc count
      // keeps k at full cluster width. Exact-decimal reductions make the
      // result independent of this partitioning (ClfSpec pins it).
      // ~2k docs/partition ≈ tens of ms of kernel work per task per round
      // (measured ~50 µs/doc at ~200 features): small enough that a round
      // is latency-bound only below ~2k docs TOTAL, large enough that a
      // task amortizes its dispatch. 20k/partition read 1 s SERIAL rounds
      // at the sf1 audit scale (k collapsed to 1) — the dial is sized to
      // the per-round work, not to bytes.
      val k = math.min(rdd.getNumPartitions.toLong, (nPos + nNeg) / 2000L + 1L).toInt
      val loopRdd = if (k < rdd.getNumPartitions) rdd.coalesce(k) else rdd

      // per-doc err under the current (bias, w): the identical IEEE chain
      // the DataFrame loop evaluated — z = bias + dk/n with dk the exact
      // decimal dot cast back to double, σ the algebraic sigmoid, err the
      // class-weighted residual. Null dk (every addend overflowed the
      // carrier — impossible on real features, mirrored anyway) skips the
      // doc exactly as null err vanished from both gradient sums before.
      def docErr(bias: Double, wArr: Array[Double],
          d: (Double, Long, Array[Long], Array[Long])): (Double, Boolean) = {
        val (y, nd, bs, ks) = d
        var dot: java.math.BigDecimal = null
        var i = 0
        while (i < bs.length) {
          val t = exactAcc(ks(i).toDouble * wArr(bs(i).toInt))
          if (t != null) dot = if (dot == null) t else dot.add(t)
          i += 1
        }
        if (dot == null) (0.0, false)
        else {
          val z = bias + dot.doubleValue / nd.toDouble
          val sig = 0.5 + 0.5 * z / (1.0 + math.abs(z))
          val cw = if (y == 1.0) cwPos else cwNeg
          (cw * (y - sig), true)
        }
      }

      var bias = 0.0
      var w = Map.empty[Int, Double]
      for (_ <- 1 to rounds) {
        val wArr = new Array[Double](buckets)
        w.foreach { case (b, x) => wArr(b) = x }
        val bw = s.sparkContext.broadcast(wArr)
        // slot 0 is the bias gradient (the old sentinel bucket −1); slot
        // b+1 is bucket b. Same addend set as the join formulation: one
        // (k/n)·err term per (doc, bucket) feature row, one err term per
        // doc — summed as exact decimals, so any order and any partition
        // merge tree produce the identical total.
        val grads = try {
          loopRdd.treeAggregate(new Array[java.math.BigDecimal](buckets + 1))(
            (g, d) => {
              val (err, ok) = docErr(bias, bw.value, d)
              if (ok) {
                val nD = d._2.toDouble
                val bs = d._3; val ks = d._4
                var i = 0
                while (i < bs.length) {
                  val t = exactAcc(ks(i).toDouble / nD * err)
                  if (t != null) {
                    val j = bs(i).toInt + 1
                    g(j) = if (g(j) == null) t else g(j).add(t)
                  }
                  i += 1
                }
                val tb = exactAcc(err)
                if (tb != null) g(0) = if (g(0) == null) tb else g(0).add(tb)
              }
              g
            },
            (a, b) => {
              var i = 0
              while (i < a.length) {
                if (a(i) == null) a(i) = b(i)
                else if (b(i) != null) a(i) = a(i).add(b(i))
                i += 1
              }
              a
            })
        } finally bw.destroy()
        val upd = collection.mutable.Map(w.toSeq: _*)
        if (grads(0) != null) bias += lr * (grads(0).doubleValue / n)
        var bi = 1
        while (bi <= buckets) {
          if (grads(bi) != null) {
            val b = bi - 1
            upd(b) = upd.getOrElse(b, 0.0) + lr * (grads(bi).doubleValue / n)
          }
          bi += 1
        }
        w = upd.toMap
      }
      // Threshold calibration: full-batch GD fixes the DIRECTION but its
      // finite-lr limit cycle leaves the intercept anywhere within ±lr/4
      // of equilibrium — useless as a keep/drop threshold. Center it:
      // bias := −(mean_ref dot + mean_background dot)/2, so logit 0 is
      // the midpoint between the class means (Platt-style calibration,
      // standard after any quality-classifier fit). One pass; class
      // means ride the exact-decimal carrier (per-doc dot/n as a double,
      // re-carried exactly as Exact.davg did), the midpoint is a fixed
      // IEEE chain — determinism unchanged.
      val wArr = new Array[Double](buckets)
      w.foreach { case (b, x) => wArr(b) = x }
      val bwF = s.sparkContext.broadcast(wArr)
      val (sPos, cPos, sNeg, cNeg) = try {
        loopRdd.treeAggregate((null: java.math.BigDecimal, 0L,
            null: java.math.BigDecimal, 0L))(
          (a, d) => {
            val (y, nd, bs, ks) = d
            var dot: java.math.BigDecimal = null
            var i = 0
            while (i < bs.length) {
              val t = exactAcc(ks(i).toDouble * bwF.value(bs(i).toInt))
              if (t != null) dot = if (dot == null) t else dot.add(t)
              i += 1
            }
            if (dot == null) a // null dot: skipped by sum AND count (SQL avg)
            else {
              // Exact.davg semantics, matched exactly: count(dot) counted
              // every NON-NULL dot, while sum(acc(dot)) skipped a dot whose
              // re-carry overflowed decimal(27,6) to null — so a non-null
              // dot always increments the count, and only a non-null
              // re-carried mean joins the sum (divergence possible only in
              // that pathological overflow case, but bit-parity with the
              // replaced Catalyst formulation must not depend on the data).
              val m = exactAcc(dot.doubleValue / nd.toDouble)
              if (y == 1.0)
                (if (a._1 == null) m
                 else if (m == null) a._1 else a._1.add(m), a._2 + 1L, a._3, a._4)
              else
                (a._1, a._2, if (a._3 == null) m
                 else if (m == null) a._3 else a._3.add(m), a._4 + 1L)
            }
          },
          (a, b) => (
            if (a._1 == null) b._1 else if (b._1 == null) a._1 else a._1.add(b._1),
            a._2 + b._2,
            if (a._3 == null) b._3 else if (b._3 == null) a._3 else a._3.add(b._3),
            a._4 + b._4))
      } finally bwF.destroy()
      // loud failure over NPE: an all-null class mean (every doc's dot
      // overflowing the decimal carrier) has no defined calibration — the
      // replaced Catalyst formulation surfaced it as a null-handling error
      // too, never as a silent 0.0
      require(sPos != null && cPos > 0L && sNeg != null && cNeg > 0L,
        s"calibration needs a non-null mean per class (pos sum=$sPos n=$cPos, neg sum=$sNeg n=$cNeg)")
      val mPos = sPos.doubleValue / cPos.toDouble
      val mNeg = sNeg.doubleValue / cNeg.toDouble
      Model(-(mPos + mNeg) / 2.0, w.toSeq.sortBy(_._1))
    } finally rdd.unpersist(blocking = false)
  }

  /** q94 — the trained model as a driver query: re-runs the FULL
    * distributed trainer on the given lake and emits (feature, weight),
    * feature −1 = bias. Oracled by the frozen [[ClfWeights]] VALUES table
    * (the BpeMerges/PcaComponents pattern: the constants were produced by
    * jobs.ClfTrain on the correctness-gate lake with this exact code, so
    * parity pins the whole distributed loop — carrier sums, the algebraic
    * sigmoid, update order — bit-exactly; retraining = rerun
    * jobs.ClfTrain, refresh the file). */
  def trainTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = train(s, Tables.documentsScaled(s, d))
    ((-1L, m.bias) +: m.weights.map { case (b, x) => (b.toLong, x) })
      .toDF("feature", "weight")
      .orderBy("feature")
  }

  /** The q94b STRATIFIED training sample: every reference-source doc +
    * the q36 deterministic hash-line sample of the background. The cost
    * lever on a real lake is the background class (the crawl IS the
    * corpus; the curated reference set is fixed and tiny by comparison),
    * so sampling only the majority class cuts per-round cost by ~frac
    * while keeping every scarce positive — the standard shape for
    * reference-vs-crawl classifier training. Deterministic under any
    * partitioning (hash line, never rand()), so the frozen
    * [[ClfWeightsSampled]] artifact reproduces bit-exactly.
    */
  def sampledTrainSet(docs: DataFrame, frac: Double,
      refSource: String = ClfWeights.RefSource): DataFrame =
    docs.filter(col("source") === refSource ||
      graft.Tables.sampleLine(col("doc_id"), frac))

  /** q94b — the SAMPLED trainer as a driver query (q94's cost-contained
    * sibling: q94 is ~15% of the whole bench, and nothing about the
    * 32-round loop needs the full background class): re-runs the
    * distributed trainer on [[sampledTrainSet]] at the frozen
    * [[ClfWeightsSampled.SampleFrac]] and emits (feature, weight).
    * Oracled by the frozen [[ClfWeightsSampled]] VALUES table — the q94
    * pattern, pinning the stratified sample line + the whole training
    * loop bit-exactly. ClfSpec pins what the artifact is FOR: the
    * sampled model scores the full lake within a stated AUC margin of
    * the full trainer.
    */
  def trainTableSampled(s: SparkSession, d: String,
      frac: Double = ClfWeightsSampled.SampleFrac): DataFrame = {
    import s.implicits._
    val m = train(s, sampledTrainSet(Tables.documentsScaled(s, d), frac))
    ((-1L, m.bias) +: m.weights.map { case (b, x) => (b.toLong, x) })
      .toDF("feature", "weight")
      .orderBy("feature")
  }

  /** Score `docs` under a model: logit_d = bias + (Σ_b k_b·w_b)/n_d.
    * One corpus featurization pass + one broadcast join + one per-doc
    * aggregation; docs with zero features emit no row (no evidence).
    * `keep` is the binary verdict at the natural logit-0 threshold.
    * UNORDERED by design: every aggregating consumer (q95b's curve,
    * q95c's eval, q98's agreement arm, the pipeline filter stages) is
    * order-insensitive, and an orderBy here survived into their physical
    * plans as a full corpus range-sort exchange (found by plan audit —
    * EliminateSorts does not fire across the explode/join subtrees).
    * [[scoreTable]] adds the q95 driver query's ordering itself. */
  private[graft] def scoreOf(docs: DataFrame, m: Model, buckets: Int,
      carry: Seq[String] = Seq("source")): DataFrame =
    scoreOfFeats(CurationOps.hashedNgramFeats(docs, buckets, carry), m, carry)

  /** [[scoreOf]] over a caller-owned (doc_id, `carry`..., b, k) feature
    * frame — the q98 seam (see dsirScoresOfFeats): the agreement matrix
    * derives these features from its wider-bucket DSIR frame instead of
    * re-featurizing the corpus. */
  private[graft] def scoreOfFeats(feats: DataFrame, m: Model,
      carry: Seq[String] = Seq("source")): DataFrame = {
    val keys = "doc_id" +: carry
    feats
      .join(broadcast(modelDf(feats.sparkSession, m)), Seq("b"), "left")
      .groupBy(keys.map(col): _*)
      .agg(sum(col("k")).as("n_feats"),
        Exact.dsum(col("k").cast("double") * coalesce(col("w"), lit(0.0))).as("dk"))
      .select(keys.map(col) :+ col("n_feats") :+
        (lit(m.bias) + col("dk") / col("n_feats").cast("double")).as("logit"): _*)
      .withColumn("keep", (col("logit") > 0).cast("int"))
  }

  /** The frozen [[ClfWeights]] as a [[Model]] — the single seam every
    * consumer of the committed artifact (q95, the batch and streaming
    * pipeline stages) goes through. */
  def frozen: Model = Model(ClfWeights.Bias, ClfWeights.values)

  /** q95 — every document scored under the FROZEN trained classifier
    * ([[ClfWeights]]): the pipeline filter stage itself (train offline,
    * score the crawl online — the split every production quality
    * classifier deploys with). One corpus scan; the model is a ≤B-row
    * broadcast; the per-doc reduce rides the exact-decimal carrier. */
  def scoreTable(s: SparkSession, d: String): DataFrame =
    scoreOf(Tables.documentsScaled(s, d), frozen, ClfWeights.Buckets)
      .orderBy("doc_id")

  /** The q95b threshold sweep, frozen with the model: logit cut points
    * spanning the trained score range (the calibrated natural threshold 0
    * is one of them, so the curve pins q95's keep count as its middle
    * row). */
  val CurveThresholds: Seq[Double] =
    Seq(-0.5, -0.2, -0.1, -0.05, 0.0, 0.05, 0.1, 0.2, 0.5)

  /** q95b — the classifier's THRESHOLD operating curve: keep volume,
    * reference recall (fraction of the clean reference source kept — the
    * quantity the filter exists to preserve), and background keep rate
    * (the crawl share surviving — what it exists to cut) at each logit
    * cut point in [[CurveThresholds]]. The fourth operating curve next to
    * q68c (ANN nprobe), q96 (LSH bands) and q97 (decontamination window):
    * a production run picks its quality/volume trade-off off this table,
    * not off the single calibrated point q95 ships.
    *
    * Scale shape: ONE scoring pass (q95's scan + broadcast-model join),
    * then a map-side explode over the bounded threshold list feeding a
    * partial aggregation — the shuffle carries |thresholds| rows per task
    * and the result is |thresholds| rows at any corpus size. Counts are
    * integers; each rate is one final IEEE division (null when its
    * denominator is empty, mirrored in the oracle).
    */
  /** q95c — the classifier's OFFLINE EVALUATION under the frozen weights
    * (the q68c of quality filtering): rank-based ROC AUC plus
    * precision/recall/accuracy at the calibrated logit-0 threshold, one
    * row out. The freeze diagnostics lived in a code comment (AUC 0.889,
    * accuracy 0.814, reference recall 0.76 on the gate lake); this makes
    * the same numbers an ORACLED query, so classifier drift — a retrain,
    * a featurization change, a corpus regeneration — is parity-visible
    * instead of doc-visible.
    *
    * AUC is the Mann-Whitney U statistic with MIDRANK tie handling
    * (P(s⁺>s⁻) + ½·P(s⁺=s⁻) — exactly the freeze diagnostic's
    * wins + 0.5·ties formula): U = Σ₊ midrank − n₊(n₊+1)/2 over the
    * combined score order. Global ranks come from the q98 machinery — a
    * range-partitioned sort + zipWithIndex with doc_id tiebreak (never a
    * partition-less Window) — and midranks from a per-tied-logit-group
    * aggregation (sum_ranks/cnt is tiebreak-independent: tied ranks are
    * consecutive integers). Σ₊ midrank rides the exact-decimal carrier;
    * each group's term and the final AUC are fixed IEEE chains, so the
    * number is bit-stable under any partitioning and the DuckDB oracle
    * mirrors it value-exactly (ROW_NUMBER ranks, same group arithmetic).
    *
    * Scale shape: ONE scoring pass (q95's scan + broadcast model), one
    * distributed sort of (logit, doc_id) 16-byte rows, two bounded
    * aggregations — no doc×doc, no driver-side score collection (the
    * freeze diagnostic collected; this does not).
    */
  def evalTable(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val scored = scoreOf(Tables.documentsScaled(s, d), frozen, ClfWeights.Buckets)
      .select(col("doc_id"), col("logit"),
        (col("source") === lit(ClfWeights.RefSource)).cast("long").as("is_ref"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persist the sorted ids BEFORE zipWithIndex (the q98 rank fix): its
    // internal per-partition count job executes the range sort once and
    // the consuming join would execute it AGAIN — zipWithIndex does not
    // cache its parent, so the sort ran twice per eval.
    val sortedIds = scored.select(col("doc_id"), col("logit"))
      .orderBy(col("logit"), col("doc_id"))
      .rdd.map(_.getLong(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // global 1-based ranks over (logit, doc_id) — the Terasort shape
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("rank", LongType, nullable = false)))
      val rrdd = sortedIds.zipWithIndex().map { case (id, i) => Row(id, i + 1L) }
      val ranks = s.createDataFrame(rrdd, schema)
      // midrank per tied-logit group: ranks in a tied group are
      // consecutive, so sum/cnt IS the midrank regardless of tiebreak
      val mid = scored.join(ranks, "doc_id")
        .groupBy(col("logit"))
        .agg(sum(col("rank")).as("sum_ranks"), count(lit(1)).as("cnt"),
          sum(col("is_ref")).as("pos_g"))
        .agg(Exact.dsum(col("pos_g").cast("double") * col("sum_ranks").cast("double")
          / col("cnt").cast("double")).as("sum_pos_midrank"))
      val stats = scored.agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_ref")).as("n_pos"),
        sum(when(col("logit") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("logit") > 0, col("is_ref")).otherwise(0L)).as("n_ref_keep"))
      val nPosD = col("n_pos").cast("double")
      val nNegD = col("n_neg").cast("double")
      val out = stats.crossJoin(mid)
        .withColumn("n_neg", col("n_docs") - col("n_pos"))
        .select(col("n_docs"), col("n_pos"), col("n_neg"), col("n_keep"), col("n_ref_keep"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            (col("sum_pos_midrank") - nPosD * (nPosD + lit(1.0)) / lit(2.0))
              / (nPosD * nNegD)).as("auc"),
          when(col("n_keep") > 0,
            col("n_ref_keep").cast("double") / col("n_keep").cast("double")).as("precision"),
          when(col("n_pos") > 0,
            col("n_ref_keep").cast("double") / col("n_pos").cast("double")).as("recall"),
          when(col("n_docs") > 0,
            (col("n_ref_keep") + col("n_neg") - (col("n_keep") - col("n_ref_keep")))
              .cast("double") / col("n_docs").cast("double")).as("accuracy"))
      // one row by construction — materialize it before releasing the
      // scored cache (a lazy return would rescan uncached)
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      sortedIds.unpersist(blocking = false)
      scored.unpersist(blocking = false)
    }
  }

  /** q95d — CALIBRATION audit of the frozen classifier (reliability
    * diagram + expected calibration error; Guo et al. ICML 2017 §2):
    * per confidence decile, how often is a doc the classifier scores
    * p ≈ 0.x actually reference-class? The fourth member of the eval
    * family (q95c ranks via AUC; this measures whether the SCORES mean
    * what they say — the property a downstream pipeline needs before
    * using p as a sampling weight or a mixing dial, not just as a
    * ranker). Confidence is the same ALGEBRAIC sigmoid the trainer
    * optimizes (one fixed IEEE chain — engine-portable), binned into
    * ten deciles; the bin = −1 rollup row carries the corpus totals and
    * ECE = Σ_b (n_b/N)·|mean_conf_b − ref_rate_b| as its `gap`.
    *
    * Scale shape: ONE scoring pass (q95's scan + broadcast model) into
    * a ≤10-group aggregation — output is bounded at any corpus size;
    * mean confidences and the ECE both ride the exact decimal carrier.
    */
  def calibrationTable(s: SparkSession, d: String): DataFrame = {
    val scored = scoreOf(Tables.documentsScaled(s, d), frozen, ClfWeights.Buckets)
    val p = lit(0.5) + lit(0.5) * col("logit") / (lit(1.0) + abs(col("logit")))
    // persisted: the ≤10-row bin table feeds its own rows AND the ECE
    // rollup — uncached, the scoring pass would run twice. Released in
    // the finally after materializing the bounded output (the evalTable
    // discipline: a long-lived session calling this repeatedly must not
    // accumulate cache entries).
    val perBin = scored
      .select(least(lit(9L), floor(p * 10).cast("long")).as("bin"), p.as("p"),
        (col("source") === lit(ClfWeights.RefSource)).cast("long").as("is_ref"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("is_ref")).as("n_ref"),
        Exact.davg(col("p")).as("mean_conf"))
      .withColumn("ref_rate", col("n_ref").cast("double") / col("n_docs").cast("double"))
      .withColumn("gap", abs(col("mean_conf") - col("ref_rate")))
      .select("bin", "n_docs", "n_ref", "mean_conf", "ref_rate", "gap")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = perBin.unionByName(
        perBin.agg(sum(col("n_docs")).as("n"), sum(col("n_ref")).as("nr"),
            Exact.dsum(col("n_docs").cast("double") * col("mean_conf")).as("sp"),
            Exact.dsum(col("n_docs").cast("double") * col("gap")).as("sg"))
          .select(lit(-1L).as("bin"), col("n").as("n_docs"), col("nr").as("n_ref"),
            (col("sp") / col("n").cast("double")).as("mean_conf"),
            (col("nr").cast("double") / col("n").cast("double")).as("ref_rate"),
            (col("sg") / col("n").cast("double")).as("gap")))
        .orderBy("bin")
      // ≤11 rows by construction — materialize before releasing the cache
      // (a lazy return would rescan uncached)
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally perBin.unpersist(blocking = false)
  }

  def thresholdCurve(s: SparkSession, d: String): DataFrame = {
    val scored = scoreOf(Tables.documentsScaled(s, d), frozen, ClfWeights.Buckets)
    val kept = (col("logit") > col("threshold")).cast("long")
    def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0L, num.cast("double") / den.cast("double"))
    scored
      .select(col("logit"),
        (col("source") === lit(ClfWeights.RefSource)).cast("long").as("is_ref"),
        explode(array(CurveThresholds.map(lit(_)): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(kept).as("n_keep"),
        sum(col("is_ref")).as("n_ref"),
        sum(kept * col("is_ref")).as("n_ref_keep"))
      .select(col("threshold"), col("n_docs"), col("n_keep"),
        rate(col("n_keep"), col("n_docs")).as("keep_rate"),
        rate(col("n_ref_keep"), col("n_ref")).as("ref_recall"),
        rate(col("n_keep") - col("n_ref_keep"), col("n_docs") - col("n_ref"))
          .as("bg_keep_rate"))
      .orderBy("threshold")
  }
}
