package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.VectorFunctions.toDouble

/** Distributed PCA by power iteration — the top principal direction of the
  * embedding corpus, the whitening/QA primitive of embedding pipelines
  * (SemDeDup-style pipelines PCA their embeddings first; an ANN index
  * whose corpus collapsed onto one axis is a data bug this surfaces).
  *
  * The covariance matrix is never materialized: each iteration applies
  * C·v = (Σᵢ sᵢ·xᵢ − (Σᵢ sᵢ)·μ) / n with sᵢ = xᵢ·v − μ·v, i.e. one
  * scalar dot per row (fixed IEEE fold order) feeding d+1 per-dimension
  * accumulators in ONE treeAggregate over the vector column — the Kmeans
  * shape: no shuffle, no posexplode (the first covApply exploded n·d rows
  * per round into an aggregation exchange; the round-9 bench measured
  * q92b at 149 CPU-s on sf0.1 from exactly that), map-side partials only,
  * d+1 longs per partition back to the driver. O(n·d) work per round,
  * never O(n·d²) or a d×d shuffle. Driver state is the d-vector itself
  * (the Kmeans/BpeTrain bounded-iteration pattern).
  *
  * Bit-stable by construction: every cross-row reduction (mean vector,
  * Σ sᵢ·xᵢ, Σ sᵢ) rides the exact-decimal carrier — each per-row term is
  * rounded to scale-6 decimal exactly as Spark's `cast(x AS
  * DECIMAL(27,6))` does (shortest-decimal repr of the double, HALF_UP —
  * see [[q6u]]) and accumulated as an unscaled long, so the sum is exact
  * and order-independent — the per-row dot is the ascending-index fold
  * (graft_dot's order), and the driver-side normalize is a fixed IEEE
  * chain. A retrain on the same lake therefore reproduces the frozen
  * [[PcaComponents]] artifact bit-for-bit under ANY partitioning, which
  * is what lets q92's oracle be the committed values themselves (the
  * treeAggregate rework was proven against the artifact frozen under the
  * old posexplode plan: same bits).
  */
object Pca {

  /** Spark's exact-carrier term, replicated: `cast(x AS DECIMAL(27,6))`
    * converts via the double's shortest decimal representation
    * (java.math.BigDecimal.valueOf) then rounds HALF_UP to scale 6.
    * Returned as the unscaled long; overflow (|x| ≳ 9.2e12) throws
    * instead of corrupting (Spark would null the cast — our embeddings
    * are O(1) and a blown-up iterate should fail loudly).
    */
  private def q6u(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** DECIMAL(·,6) → DOUBLE, as Spark's final `.cast("double")`. */
  private def dec6(unscaled: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), 6)
      .doubleValue()

  private def mergeAcc(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  /** The persisted corpus + its exact-carrier mean: shared prep for the
    * iteration loops. One scan counts; one treeAggregate computes μ
    * (Exact.davg semantics: exact scale-6 sum → double, one IEEE divide).
    */
  private final case class Corpus(rdd: RDD[Array[Double]], n: Long,
      dims: Int, mu: Array[Double]) {
    def unpersist(): Unit = rdd.unpersist(blocking = false)
  }

  private def load(s: SparkSession, d: String): Corpus = {
    import s.implicits._
    val rdd = Tables.embeddingsScaled(s, d)
      .select(toDouble(col("embedding")).as("v"))
      .as[Seq[Double]].rdd.map(_.toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count()
    require(n > 0, "empty embeddings table")
    val dims = rdd.first().length
    val acc = rdd.treeAggregate(new Array[Long](dims))(
      (a, x) => {
        require(x.length == dims, s"ragged embedding dims: ${x.length} vs $dims")
        var p = 0
        while (p < dims) { a(p) = Math.addExact(a(p), q6u(x(p))); p += 1 }
        a
      },
      mergeAcc)
    Corpus(rdd, n, dims, acc.map(u => dec6(u) / n))
  }

  /** One application of the centered covariance to `v` (not normalized),
    * through the exact-decimal carrier: one broadcast + one treeAggregate,
    * zero shuffles. */
  private def covApply(c: Corpus, v: Array[Double]): Array[Double] = {
    val dims = c.dims
    var muDotV = 0.0
    var i = 0
    while (i < dims) { muDotV += c.mu(i) * v(i); i += 1 }
    val bcV = c.rdd.sparkContext.broadcast(v)
    val mdv = muDotV
    // slots [0,dims) = Σ q6(s·x_p); slot dims = Σ q6(s)
    val acc = c.rdd.treeAggregate(new Array[Long](dims + 1))(
      (a, x) => {
        val vv = bcV.value
        var s = 0.0
        var j = 0
        while (j < dims) { s += x(j) * vv(j); j += 1 } // graft_dot's ascending fold
        s -= mdv
        var p = 0
        while (p < dims) { a(p) = Math.addExact(a(p), q6u(s * x(p))); p += 1 }
        a(dims) = Math.addExact(a(dims), q6u(s))
        a
      },
      mergeAcc)
    bcV.destroy()
    val ss = dec6(acc(dims))
    val w = new Array[Double](dims)
    var p = 0
    while (p < dims) { w(p) = (dec6(acc(p)) - ss * c.mu(p)) / c.n; p += 1 }
    w
  }

  private def normOf(w: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i < w.length) { a += w(i) * w(i); i += 1 }
    math.sqrt(a)
  }

  /** Power iteration: top eigenvector of the corpus covariance and its
    * eigenvalue (‖C·v‖ at convergence). Deterministic: uniform init
    * 1/√d, fixed iteration count, exact-carrier reductions; the sign is
    * canonicalized at the end (the largest-|component| coordinate made
    * positive) so the artifact does not depend on the init's sign.
    */
  def topComponent(s: SparkSession, d: String,
      iters: Int = PcaComponents.Iters): (Array[Double], Double, Long) = {
    require(iters >= 1 && iters <= 256, s"iters in [1,256]; got $iters")
    val c = load(s, d)
    try {
      var v = Array.fill(c.dims)(1.0 / math.sqrt(c.dims.toDouble))
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val w = covApply(c, v)
        lambda = normOf(w)
        require(lambda > 0.0, "covariance annihilated the iterate (degenerate corpus)")
        v = w.map(_ / lambda)
      }
      // canonical sign: the largest-magnitude coordinate is positive
      val am = v.indices.maxBy(i => math.abs(v(i)))
      if (v(am) < 0) v = v.map(x => -x)
      (v, lambda, c.n)
    } finally c.unpersist()
  }

  /** q92 — the trained top component as a driver query: re-runs the FULL
    * power iteration on the given lake and emits one row per dimension
    * (dim_idx, component, eigenvalue). Oracled by the frozen
    * [[PcaComponents]] VALUES table (the BpeMerges/PqCodebooks pattern:
    * the constants were produced by jobs.PcaTrain on the correctness-gate
    * lake with this exact code, so parity pins the whole distributed
    * iteration — carrier sums, dot order, normalize, sign rule —
    * bit-exactly; retraining = rerun jobs.PcaTrain, refresh the file).
    */
  def topComponentTable(s: SparkSession, d: String,
      iters: Int = PcaComponents.Iters): DataFrame = {
    import s.implicits._
    val (v, lambda, _) = topComponent(s, d, iters)
    v.toSeq.zipWithIndex
      .map { case (x, i) => ((i + 1).toLong, x, lambda) }
      .toDF("dim_idx", "component", "eigenvalue")
  }

  /** The top K principal components by DEFLATED power iteration
    * (Hotelling deflation): after component (u_j, λ_j) converges, every
    * later covariance application subtracts λ_j·(u_j·v)·u_j. The
    * deflation is pure driver arithmetic over the d-vector state in
    * fixed component/index order — the distributed work per round stays
    * ONE covApply pass, and the whole loop remains bit-stable under any
    * partitioning.
    *
    * Output ranks are SORTED by eigenvalue estimate (descending; ties by
    * discovery order), so a consumer reading `componentsK` as a spectrum
    * sees it non-increasing even when the fixed iteration budget has not
    * fully converged on a near-isotropic corpus (where deflation
    * DISCOVERY order can interleave within the unconverged tolerance —
    * the estimates are Rayleigh quotients after Iters rounds). Deflation
    * itself always runs in discovery order; sorting is output-only
    * relabeling. The first DISCOVERED component runs with an empty
    * deflation set and is bit-identical to [[topComponent]]; since
    * undeflated power iteration converges to the TOP eigenvalue, it also
    * sorts first (spec-pinned on the gate corpus): the K-artifact cannot
    * drift from the q92 artifact.
    */
  def topComponents(s: SparkSession, d: String, k: Int = PcaComponents.K,
      iters: Int = PcaComponents.Iters): (Seq[(Array[Double], Double)], Long) = {
    require(k >= 1 && k <= 16, s"k in [1,16]; got $k")
    require(iters >= 1 && iters <= 256, s"iters in [1,256]; got $iters")
    val c = load(s, d)
    try {
      val dims = c.dims
      val found = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
      for (_ <- 1 to k) {
        var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
        var lambda = 0.0
        for (_ <- 1 to iters) {
          val w = covApply(c, v)
          found.foreach { case (u, lam) =>
            var uv = 0.0
            var i = 0
            while (i < dims) { uv += u(i) * v(i); i += 1 }
            i = 0
            while (i < dims) { w(i) -= lam * uv * u(i); i += 1 }
          }
          lambda = normOf(w)
          require(lambda > 0.0,
            s"deflated covariance annihilated the iterate at component ${found.size + 1}")
          v = w.map(_ / lambda)
        }
        val am = v.indices.maxBy(i => math.abs(v(i)))
        found += (((if (v(am) < 0) v.map(x => -x) else v), lambda))
      }
      // non-increasing spectrum out; discovery-index tiebreak keeps the
      // sort deterministic (and a fully-converged run is already sorted)
      val sorted = found.zipWithIndex
        .sortBy { case ((_, lam), i) => (-lam, i) }
        .map(_._1)
      (sorted.toSeq, c.n)
    } finally c.unpersist()
  }

  /** q92b — the top-K spectrum as a driver query: re-runs the deflated
    * iteration and emits (comp_idx, dim_idx, component, eigenvalue) rows.
    * Oracled by the frozen [[PcaComponents.componentsK]] VALUES table
    * (same provenance pattern as q92: jobs.PcaTrain on the gate lake,
    * bit-exact parity).
    */
  def topComponentsTable(s: SparkSession, d: String,
      k: Int = PcaComponents.K, iters: Int = PcaComponents.Iters): DataFrame = {
    import s.implicits._
    val (comps, _) = topComponents(s, d, k, iters)
    comps.zipWithIndex.flatMap { case ((v, lam), ci) =>
      v.toSeq.zipWithIndex.map { case (x, i) =>
        ((ci + 1).toLong, (i + 1).toLong, x, lam)
      }
    }.toDF("comp_idx", "dim_idx", "component", "eigenvalue")
  }
}
