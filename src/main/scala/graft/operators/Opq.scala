package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (Ge, He, Ke & Sun, "Optimized Product
  * Quantization for Approximate Nearest Neighbor Search", CVPR 2013 —
  * the non-parametric OPQ_NP solution): learn an ORTHOGONAL rotation R of
  * the embedding space jointly with the per-subspace PQ codebooks, so the
  * fixed coordinate-slice subspaces PQ quantizes are aligned with the
  * data instead of whatever basis the embedder happened to emit. Plain PQ
  * is the degenerate R = I case; on correlated dimensions (the common
  * case for learned embeddings) the rotation strictly lowers quantization
  * distortion at the SAME code budget — 4 bytes per vector either way —
  * which is pure recall at 100 TB where the code budget is the binding
  * constraint.
  *
  * Training is the paper's alternating minimization, each step monotone
  * non-increasing in the objective Σ‖R·x − y(x)‖²:
  *   1. init: R = I, codebooks from deterministic sampled-init
  *      (per-subspace takeOrdered hash-uniform seeds — the
  *      [[Kmeans.trainSampled]] device) polished by Lloyd, so the
  *      starting objective is ~the plain-PQ distortion;
  *   2. Procrustes step (codes fixed): R = argmin over orthogonal R of
  *      Σ‖R·x − y‖² = V·Uᵀ where Σ x·yᵀ = U·S·Vᵀ — the 64×64
  *      cross-covariance comes back from ONE shuffle-free map-side
  *      pass, the SVD runs driver-side ([[svdRotation]], one-sided
  *      Jacobi — a 64×64 problem regardless of corpus size);
  *   3. codebook step (R fixed): fused per-subspace Lloyd refresh
  *      WARM-STARTED from the previous books (re-initializing k-means||
  *      each round would break monotonicity and waste passes).
  *
  * Scale shape: the trainer sees a DETERMINISTIC hash-line sample bounded
  * to [[Opq.TrainCap]] points (the FAISS max-train-points device — OPQ is
  * an offline index-training artifact, not a corpus pass), canonicalized
  * (hash-partition + in-partition sort) and cached once; every step is a
  * broadcast + map-side pass over that sample. Model size is
  * dim² + m·k·(dim/m) doubles (~37 KB at 64/8/16) — broadcastable
  * anywhere.
  *
  * Determinism is engineered, not hoped for — the output is a bit-frozen
  * artifact: every distributed reduction here merges partials in
  * PARTITION-INDEX order (treeAggregate/reduce merge in task-ARRIVAL
  * order, and the SVD amplifies that ulp noise into visibly different
  * rotations), seeding is takeOrdered (sorts values, arrival-immune),
  * and the sample layout is canonical. Bit-reproducible for a fixed
  * (lake, dials, seed, partition count) — in-session and cross-JVM.
  */
object Opq {

  /** Training-sample bound: ~128 points per (subspace codeword) × the 8
    * subspaces beyond FAISS's 64-ppc default — comfortably past where
    * OPQ's 4k-parameter rotation saturates, and small enough that the
    * ~130 training passes over it stay an offline footnote. */
  val TrainCap: Long = 1L << 17

  /** Outer alternating-minimization rounds. Ge et al. report the
    * objective flattening within a handful of iterations (§5.1 uses 100
    * for benchmarking; the knee is early); 4 rounds each of (Procrustes +
    * warm Lloyd) lands within float noise of the plateau on the gate
    * lake. */
  val OpqIters: Int = 4

  /** Lloyd refreshes per subspace per outer round — warm-started, so
    * these polish rather than re-learn. */
  val LloydIters: Int = 4

  /** Train (R, codebooks) on `vecs` (columns `id: long`, `v:
    * array<double>` of length `dim`). Returns the rotation as dim×dim
    * row-major (R(i) is the row producing rotated coordinate i) and the
    * m×k×(dim/m) codebooks IN THE ROTATED SPACE. Deterministic for a
    * fixed seed and input set.
    */
  def train(spark: SparkSession, vecs: DataFrame, dim: Int, m: Int, k: Int,
      seed: Long): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    import spark.implicits._

    val n = vecs.count()
    require(n > 0, "Opq.train: empty training input")
    val frac = math.min(1.0, TrainCap.toDouble / n)
    // Canonical sample layout: hash-partition on id + within-partition
    // sort. The input may arrive straight off a shuffle (the residual
    // frame is a groupBy output) whose WITHIN-PARTITION row order varies
    // run to run — per-partition float accumulation order would vary
    // with it, and this trainer's output is a bit-frozen artifact. One
    // bounded-sample shuffle buys input-order independence.
    val sample = vecs.filter(graft.Tables.sampleLine(col("id"), frac))
      .select(col("id").cast("long"), col("v"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Seq[Double])]
      .rdd.map { case (id, v) => (id, v.toArray) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- init: R = I; books from the DETERMINISTIC sampled-init
      // recipe (per-subspace takeOrdered hash-uniform seeds — the
      // Kmeans.trainSampled device, seed + sub mirroring Pq.train's
      // per-subspace convention) polished by ordered Lloyd. NOT
      // Pq.train: k-means||'s cost aggregates merge in task-arrival
      // order, which this trainer's bit-frozen output cannot tolerate
      // (observed diverging when the input frame is expensive enough to
      // randomize first-pass task timings). takeOrdered sorts VALUES, so
      // it is arrival-order-independent by construction. ----
      var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
      var books = Array.tabulate(m) { sub =>
        val seeds = sample
          .map { case (id, v) =>
            (id, java.util.Arrays.copyOfRange(v, sub * subDim, (sub + 1) * subDim))
          }
          .takeOrdered(k)(Ordering.by { case (id, _) =>
            (Kmeans.hashUniform(id, seed + sub, -1), id)
          })
          .map(_._2)
        require(seeds.nonEmpty, "Opq.train: empty sample")
        if (seeds.length >= k) seeds
        else Array.tabulate(k)(i => seeds(i % seeds.length))
      }
      books = refreshBooks(spark, sample.map(_._2), books, subDim, iters = 10)

      for (_ <- 0 until OpqIters) {
        // ---- Procrustes step: G = Σ x·yᵀ, one map-side pass. NOT
        // treeAggregate: its final merge folds partials in TASK-ARRIVAL
        // order, and the Jacobi SVD amplifies that ulp-level noise into
        // visibly different rotations (observed: two identical-config
        // runs diverging at 1e-14, which a full-precision freeze cannot
        // tolerate). The partition-indexed collect + ordered fold makes
        // the merge order part of the recipe — dim² doubles per
        // partition to the driver, trivial at any scale. ----
        val bcR = spark.sparkContext.broadcast(r)
        val bcB = spark.sparkContext.broadcast(books)
        val partials = sample.map(_._2).mapPartitionsWithIndex { (pi, it) =>
          val acc = Array.fill(dim)(new Array[Double](dim))
          it.foreach { x =>
            val xr = matvec(bcR.value, x)
            val y = reconstruct(bcB.value, xr, subDim)
            var a = 0
            while (a < dim) {
              val row = acc(a); val xa = x(a)
              var b = 0
              while (b < dim) { row(b) += xa * y(b); b += 1 }
              a += 1
            }
          }
          Iterator((pi, acc))
        }.collect().sortBy(_._1).map(_._2)
        val g = partials.reduce { (p, q) =>
          var a = 0
          while (a < dim) {
            val pa = p(a); val qa = q(a)
            var b = 0
            while (b < dim) { pa(b) += qa(b); b += 1 }
            a += 1
          }
          p
        }
        bcR.destroy(); bcB.destroy()
        r = svdRotation(g)

        // ---- codebook step: warm-started Lloyd over the freshly
        // rotated sample — all m subspaces refreshed in ONE fused pass
        // per Lloyd iteration (each subspace's assignment reads only its
        // own book, so the fusion is exactly m independent Lloyd steps
        // at 1/m the scans), with the same partition-ordered merge as G
        // (Kmeans.lloyd's treeAggregate merges in arrival order — fine
        // for its own empirically stable freezes, not for one feeding an
        // SVD). ----
        val bcR2 = spark.sparkContext.broadcast(r)
        val rotated = sample.map { case (_, x) => matvec(bcR2.value, x) }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        books = refreshBooks(spark, rotated, books, subDim, LloydIters)
        rotated.unpersist(blocking = false)
        bcR2.destroy()
      }
      (r, books)
    } finally sample.unpersist(blocking = false)
  }

  /** Mean squared reconstruction error Σ‖R·x − y(x)‖²/n over `vecs` —
    * the OPQ objective, for comparing a (rotation, books) pair against
    * plain PQ (pass R = identity). One treeAggregate pass. */
  def distortion(spark: SparkSession, vecs: DataFrame,
      r: Array[Array[Double]], books: Array[Array[Array[Double]]]): Double = {
    import spark.implicits._
    val dim = r.length
    val subDim = dim / books.length
    val bcR = spark.sparkContext.broadcast(r)
    val bcB = spark.sparkContext.broadcast(books)
    val (sum, n) = vecs.select(col("v")).as[Seq[Double]].rdd
      .map { sv =>
        val xr = matvec(bcR.value, sv.toArray)
        val y = reconstruct(bcB.value, xr, subDim)
        var d = 0.0; var i = 0
        while (i < dim) { val t = xr(i) - y(i); d += t * t; i += 1 }
        (d, 1L)
      }
      .treeAggregate((0.0, 0L))((a, x) => (a._1 + x._1, a._2 + x._2),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    sum / math.max(1L, n)
  }

  /** Warm-started Lloyd refresh of ALL m subspace codebooks over the
    * (already rotated) sample — one fused pass per iteration, each
    * accumulating per-(subspace, code) sums and counts, merged in
    * PARTITION-INDEX order (deterministic bits — see the Procrustes
    * note). Empty codes keep their previous codeword, matching
    * [[Kmeans.lloyd]]'s convention. */
  private def refreshBooks(spark: SparkSession,
      rotated: org.apache.spark.rdd.RDD[Array[Double]],
      books0: Array[Array[Array[Double]]], subDim: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val m = books0.length
    val k = books0(0).length
    var books = books0
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(books)
      val partials = rotated.mapPartitionsWithIndex { (pi, it) =>
        val bs = bc.value
        val acc = Array.fill(m, k)(new Array[Double](subDim + 1))
        it.foreach { xr =>
          var sub = 0
          while (sub < m) {
            val off = sub * subDim
            val c = argminCode(bs(sub), xr, off, subDim)
            val row = acc(sub)(c)
            var j = 0
            while (j < subDim) { row(j) += xr(off + j); j += 1 }
            row(subDim) += 1.0
            sub += 1
          }
        }
        Iterator((pi, acc))
      }.collect().sortBy(_._1).map(_._2)
      val agg = partials.reduce { (p, q) =>
        var sub = 0
        while (sub < m) {
          var c = 0
          while (c < k) {
            val pc = p(sub)(c); val qc = q(sub)(c)
            var j = 0
            while (j <= subDim) { pc(j) += qc(j); j += 1 }
            c += 1
          }
          sub += 1
        }
        p
      }
      books = Array.tabulate(m)(sub => Array.tabulate(k) { c =>
        val n = agg(sub)(c)(subDim)
        if (n == 0) books(sub)(c)
        else Array.tabulate(subDim)(j => agg(sub)(c)(j) / n)
      })
      bc.destroy()
    }
    books
  }

  /** Strict-< L2 argmin of `xr[off, off+subDim)` over a codebook,
    * smallest code on ties — the engine-wide assignment convention,
    * shared by [[reconstruct]] and [[refreshBooks]]. */
  private def argminCode(book: Array[Array[Double]], xr: Array[Double],
      off: Int, subDim: Int): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < book.length) {
      val cv = book(c)
      var d = 0.0; var j = 0
      while (j < subDim) { val t = xr(off + j) - cv(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Row-major matrix·vector — ascending-j accumulation, the exact fold
    * order the DuckDB oracle's list_reduce replays (q70d's rotation must
    * be bit-identical across engines). */
  private[graft] def matvec(r: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val dim = r.length
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val row = r(i)
      var s = 0.0; var j = 0
      while (j < dim) { s += row(j) * v(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }

  /** Nearest-codeword reconstruction of an (already rotated) vector:
    * per subspace, strict-< L2 argmin keeping the smallest code on ties
    * (the engine-wide assignment convention), concatenated back to a
    * dim-vector. */
  private[graft] def reconstruct(books: Array[Array[Array[Double]]],
      xr: Array[Double], subDim: Int): Array[Double] = {
    val dim = xr.length
    val y = new Array[Double](dim)
    var sub = 0
    while (sub < books.length) {
      val off = sub * subDim
      val book = books(sub)
      System.arraycopy(book(argminCode(book, xr, off, subDim)), 0, y, off, subDim)
      sub += 1
    }
    y
  }

  /** The Procrustes solution R = V·Uᵀ for G = Σ x·yᵀ = U·S·Vᵀ —
    * the orthogonal maximizer of tr(R·G), hence the minimizer of
    * Σ‖R·x − y‖² for fixed codes. SVD by ONE-SIDED JACOBI (Hestenes):
    * repeatedly rotate column pairs of A = G to mutual orthogonality,
    * accumulating the rotations into V; at convergence A's columns are
    * U·S. 64×64 driver-side work, deterministic (fixed sweep order,
    * no randomness). Zero singular values (rank-deficient G — only
    * reachable on degenerate training sets) complete U to an orthonormal
    * basis by Gram–Schmidt against the identity so R stays orthogonal.
    */
  private[graft] def svdRotation(g: Array[Array[Double]]): Array[Array[Double]] = {
    val n = g.length
    val a = Array.tabulate(n)(i => g(i).clone()) // row-major copy; columns are a(·)(j)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14
    var sweep = 0
    var rotatedAny = true
    while (rotatedAny && sweep < 60) {
      rotatedAny = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < n) {
            val x = a(i)(p); val y = a(i)(q)
            app += x * x; aqq += y * y; apq += x * y
            i += 1
          }
          if (math.abs(apq) > eps * math.sqrt(app * aqq)) {
            rotatedAny = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val cs = 1.0 / math.sqrt(1.0 + t * t)
            val sn = cs * t
            i = 0
            while (i < n) {
              val x = a(i)(p); val y = a(i)(q)
              a(i)(p) = cs * x - sn * y
              a(i)(q) = sn * x + cs * y
              val vx = v(i)(p); val vy = v(i)(q)
              v(i)(p) = cs * vx - sn * vy
              v(i)(q) = sn * vx + cs * vy
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // column norms are the singular values; normalized columns are U
    val u = Array.fill(n)(new Array[Double](n)) // u(i)(j): row i, col j
    val sTol = {
      var maxS = 0.0
      var j = 0
      while (j < n) {
        var s2 = 0.0; var i = 0
        while (i < n) { val x = a(i)(j); s2 += x * x; i += 1 }
        if (s2 > maxS) maxS = s2
        j += 1
      }
      math.sqrt(maxS) * 1e-12
    }
    val valid = new Array[Boolean](n)
    var j = 0
    while (j < n) {
      var s2 = 0.0; var i = 0
      while (i < n) { val x = a(i)(j); s2 += x * x; i += 1 }
      val s = math.sqrt(s2)
      if (s > sTol) {
        valid(j) = true
        i = 0
        while (i < n) { u(i)(j) = a(i)(j) / s; i += 1 }
      }
      j += 1
    }
    // Gram–Schmidt completion for any null columns (keeps R orthogonal)
    j = 0
    while (j < n) {
      if (!valid(j)) {
        var cand = 0
        var done = false
        while (cand < n && !done) {
          val w = new Array[Double](n)
          w(cand) = 1.0
          var jj = 0
          while (jj < n) {
            if (valid(jj)) {
              var dot = 0.0; var i = 0
              while (i < n) { dot += u(i)(jj) * w(i); i += 1 }
              i = 0
              while (i < n) { w(i) -= dot * u(i)(jj); i += 1 }
            }
            jj += 1
          }
          var nn = 0.0; var i = 0
          while (i < n) { nn += w(i) * w(i); i += 1 }
          if (nn > 1e-6) {
            val inv = 1.0 / math.sqrt(nn)
            i = 0
            while (i < n) { u(i)(j) = w(i) * inv; i += 1 }
            valid(j) = true
            done = true
          }
          cand += 1
        }
        require(valid(j), "svdRotation: failed to complete orthonormal basis")
      }
      j += 1
    }
    // R = V·Uᵀ: R(i)(j) = Σ_l V(i)(l)·U(j)(l)
    Array.tabulate(n, n) { (i, jj) =>
      var s = 0.0; var l = 0
      while (l < n) { s += v(i)(l) * u(jj)(l); l += 1 }
      s
    }
  }
}
