package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.functions.VectorFunctions.{dot, toDouble}

/** Distributed PCA by power iteration — the top principal direction of the
  * embedding corpus, the whitening/QA primitive of embedding pipelines
  * (SemDeDup-style pipelines PCA their embeddings first; an ANN index
  * whose corpus collapsed onto one axis is a data bug this surfaces).
  *
  * The covariance matrix is never materialized: each iteration applies
  * C·v = (Σᵢ sᵢ·xᵢ − (Σᵢ sᵢ)·μ) / n with sᵢ = xᵢ·v − μ·v, i.e. one
  * scalar dot per row (native codegen, fixed IEEE fold order) plus one
  * posexplode aggregation of d rows per vector — O(n·d) per round, never
  * O(n·d²) or a d×d shuffle. Driver state is the d-vector itself (the
  * Kmeans/BpeTrain bounded-iteration pattern: k corpus passes, k·d
  * driver doubles).
  *
  * Bit-stable by construction: every cross-row reduction (mean vector,
  * Σ sᵢ·xᵢ, Σ sᵢ) rides the exact-decimal carrier, the per-row dot is the
  * fixed-order graft_dot fold, and the driver-side normalize is a fixed
  * IEEE chain — so a retrain on the same lake reproduces the frozen
  * [[PcaComponents]] artifact bit-for-bit under ANY partitioning, which
  * is what lets q92's oracle be the committed values themselves.
  */
object Pca {

  /** One application of the centered covariance to `v` (not normalized).
    * Returns (C·v, through the exact-decimal carrier). */
  private def covApply(vecs: DataFrame, mu: Array[Double],
      v: Array[Double], n: Long): Array[Double] = {
    val vLit = array(v.map(lit): _*)
    var muDotV = 0.0
    var i = 0
    while (i < v.length) { muDotV += mu(i) * v(i); i += 1 }
    val agg = vecs
      .select(col("v"), (dot(col("v"), vLit) - lit(muDotV)).as("s"))
      .select(col("s"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("p")
      .agg(Exact.dsum(col("s") * col("x")).as("sx"),
        Exact.dsum(col("s")).as("ss"))
      .collect()
    val w = new Array[Double](v.length)
    agg.foreach { r =>
      val p = r.getInt(0)
      w(p) = (r.getDouble(1) - r.getDouble(2) * mu(p)) / n
    }
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
    val vecs = Tables.embeddingsScaled(s, d)
      .select(toDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      require(n > 0, "empty embeddings table")
      val dims = vecs.select(size(col("v"))).head().getInt(0)
      val mu = vecs
        .select(posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("p").agg(Exact.davg(col("x")).as("m"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
      require(mu.length == dims, s"ragged embedding dims: ${mu.length} vs $dims")

      var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val w = covApply(vecs, mu, v, n)
        lambda = normOf(w)
        require(lambda > 0.0, "covariance annihilated the iterate (degenerate corpus)")
        v = w.map(_ / lambda)
      }
      // canonical sign: the largest-magnitude coordinate is positive
      val am = v.indices.maxBy(i => math.abs(v(i)))
      if (v(am) < 0) v = v.map(x => -x)
      (v, lambda, n)
    } finally vecs.unpersist(blocking = false)
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
    * partitioning. Component 1 runs with an empty deflation set, so it
    * is bit-identical to [[topComponent]] (spec-pinned): the K-artifact
    * cannot drift from the q92 artifact.
    */
  def topComponents(s: SparkSession, d: String, k: Int = PcaComponents.K,
      iters: Int = PcaComponents.Iters): (Seq[(Array[Double], Double)], Long) = {
    require(k >= 1 && k <= 16, s"k in [1,16]; got $k")
    require(iters >= 1 && iters <= 256, s"iters in [1,256]; got $iters")
    val vecs = Tables.embeddingsScaled(s, d)
      .select(toDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      require(n > 0, "empty embeddings table")
      val dims = vecs.select(size(col("v"))).head().getInt(0)
      val mu = vecs
        .select(posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("p").agg(Exact.davg(col("x")).as("m"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
      require(mu.length == dims, s"ragged embedding dims: ${mu.length} vs $dims")
      val found = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
      for (_ <- 1 to k) {
        var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
        var lambda = 0.0
        for (_ <- 1 to iters) {
          val w = covApply(vecs, mu, v, n)
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
      (found.toSeq, n)
    } finally vecs.unpersist(blocking = false)
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
