package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means for training the IVF coarse quantizer
  * (SimilarityOps.knnIvf) — the offline "train the index" step the
  * reference pipeline delegates to its ANN tooling.
  *
  * Shape: k-means|| initialization (Bahmani et al., VLDB'12 — the
  * oversampling scheme MLlib also uses) made fully DETERMINISTIC by
  * replacing the random draws with hash-uniform values u(id, seed, round),
  * then Lloyd iterations where each pass broadcasts the k x dim centroid
  * matrix and aggregates per-cluster sums with ONE treeAggregate over the
  * corpus: no shuffle at all, map-side partial sums only, k x (dim+1)
  * doubles back to the driver per iteration. Scales to any corpus the
  * executors can scan; only the ~rounds x 2k candidate set ever reaches
  * the driver.
  */
object Kmeans {

  private def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      val cv = cs(c)
      while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def minSqDist(cs: Seq[Array[Double]], v: Array[Double]): Double = {
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      val cv = cs(c)
      while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }

  /** Deterministic stand-in for a uniform [0,1) draw: the top 53 bits of a
    * mixed 64-bit hash of (id, seed, round). `private[operators]` — the
    * [[Opq]] trainer's deterministic sampled-init draws through the SAME
    * hash so the seeding device exists once.
    */
  private[operators] def hashUniform(id: Long, seed: Long, round: Int): Double = {
    var x = id * 0x9e3779b97f4a7c15L + seed * 0xc2b2ae3d27d4eb4fL + round * 0x165667b19e3779f9L
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    (x >>> 11).toDouble / (1L << 53).toDouble
  }

  /** k-means|| oversampling init: one seed center, then `rounds` passes
    * each sampling points with probability min(1, l * d^2(x, C) / cost(C))
    * (l = 2k), then a driver-side weighted Lloyd reduction of the candidate
    * set to k centers. Every pass is a broadcast + map over the corpus.
    */
  private def initParallel(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[(Long, Array[Double])],
      k: Int, seed: Long, rounds: Int = 5): Array[Array[Double]] = {
    val sc = spark.sparkContext
    // deterministic "random" first center: minimal hash wins
    val first = rdd.min()(Ordering.by { case (id, _) => (hashUniform(id, seed, -1), id) })._2
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
    val l = 2.0 * k
    for (r <- 0 until rounds) {
      val bc = sc.broadcast(centers.toSeq)
      val cost = rdd.map { case (_, v) => minSqDist(bc.value, v) }
        .treeAggregate(0.0)(_ + _, _ + _)
      if (cost > 0) {
        val sampled = rdd.filter { case (id, v) =>
          hashUniform(id, seed, r) < l * minSqDist(bc.value, v) / cost
        }.collect()
        // stable order: candidates appended by id so rounds are reproducible
        centers ++= sampled.sortBy(_._1).map(_._2)
      }
      bc.destroy()
    }
    // weight candidates by the corpus mass they attract, then reduce to k
    // with a local weighted Lloyd (the standard k-means|| finishing step)
    val cand = centers.toArray
    val bcC = sc.broadcast(cand)
    val weights = rdd.map { case (_, v) => nearest(bcC.value, v) }
      .countByValue()
    bcC.destroy()
    val w = Array.tabulate(cand.length)(i => weights.getOrElse(i, 0L).toDouble)
    // start from the k heaviest candidates (deterministic tie-break by
    // index). A low-diversity corpus (fewer than k distinct vectors —
    // cost hits 0, rounds stop sampling) pads by cycling the candidates:
    // duplicate centroids are the correct degenerate answer, matching what
    // plain seeded-sample init produced.
    var local = w.zipWithIndex.sortBy { case (wt, i) => (-wt, i) }
      .take(k).map { case (_, i) => cand(i) }
    if (local.length < k)
      local = Array.tabulate(k)(i => local(i % local.length))
    val dim = first.length
    for (_ <- 0 until 20) {
      val sums = Array.fill(k)(new Array[Double](dim + 1))
      var i = 0
      while (i < cand.length) {
        val c = nearest(local, cand(i))
        var j = 0
        while (j < dim) { sums(c)(j) += cand(i)(j) * w(i); j += 1 }
        sums(c)(dim) += w(i)
        i += 1
      }
      local = Array.tabulate(k) { c =>
        if (sums(c)(dim) == 0) local(c)
        else Array.tabulate(dim)(j => sums(c)(j) / sums(c)(dim))
      }
    }
    local
  }

  /** `iters` distributed Lloyd passes from `init`: each pass broadcasts
    * the centroid matrix and treeAggregates per-cluster (sum, count) —
    * map-side partials only, no shuffle, k×(dim+1) doubles to the driver
    * per pass. Empty clusters keep their previous centroid. */
  private def lloyd(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[Array[Double]],
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val k = init.length
    val dim = init(0).length
    var centroids = init
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // per-cluster (sum, count) in one pass, combined tree-wise
      val agg = rdd.treeAggregate(Array.fill(k)(new Array[Double](dim + 1)))(
        (acc, v) => {
          val c = nearest(bc.value, v)
          var i = 0
          while (i < dim) { acc(c)(i) += v(i); i += 1 }
          acc(c)(dim) += 1.0
          acc
        },
        (a, b) => {
          var c = 0
          while (c < k) {
            var i = 0
            while (i <= dim) { a(c)(i) += b(c)(i); i += 1 }
            c += 1
          }
          a
        })
      centroids = Array.tabulate(k) { c =>
        val n = agg(c)(dim)
        if (n == 0) centroids(c) else Array.tabulate(dim)(i => agg(c)(i) / n)
      }
      bc.destroy()
    }
    centroids
  }

  /** Train k centroids on `vecs` (columns `id: long`, `v: array<double>`):
    * k-means|| init, then `iters` distributed Lloyd iterations.
    * Deterministic for a fixed (k, iters, seed) and input set. Empty
    * clusters keep their previous centroid.
    */
  def train(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    import spark.implicits._
    val data = vecs.select(col("id").cast("long"), col("v")).as[(Long, Seq[Double])]
    // ONE cached RDD serves both init and Lloyd: the scan + row decode (the
    // expensive part at corpus scale) runs once, ids ride along for the
    // hash-uniform draws
    val idRdd = data.rdd.map { case (id, v) => (id, v.toArray) }.cache()
    try lloyd(spark, idRdd.map(_._2), initParallel(spark, idRdd, k, seed), iters)
    finally idRdd.unpersist()
  }

  /** LARGE-k trainer for the auto coarse quantizer: k-means||'s finishing
    * step reduces ~10k candidates against k centroids DRIVER-SIDE, which
    * is O(k²·dim) and stops scaling once k follows the corpus (k ≈ √n).
    * This variant replaces it with the standard big-index recipe:
    * deterministic sample-init — the k input points with the smallest
    * hash-uniform draw (one distributed takeOrdered; ties by id) — then
    * `iters` distributed Lloyd passes over the (already sampled) input.
    * The caller bounds the input to ~mppc points per centroid (FAISS's
    * max_points_per_centroid device), so training costs O(k·mppc·d·iters)
    * = O(n·d·iters) when k ≈ √n — never O(n·k). Deterministic for a
    * fixed (k, iters, seed) and input set; fewer distinct points than k
    * pads by cycling (duplicate centroids are the correct degenerate
    * answer, matching initParallel's convention).
    */
  def trainSampled(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    import spark.implicits._
    val data = vecs.select(col("id").cast("long"), col("v")).as[(Long, Seq[Double])]
    val idRdd = data.rdd.map { case (id, v) => (id, v.toArray) }.cache()
    try {
      val seeds = idRdd
        .takeOrdered(k)(Ordering.by { case (id, _) => (hashUniform(id, seed, -1), id) })
        .map(_._2)
      require(seeds.nonEmpty, "trainSampled: empty training input")
      val init =
        if (seeds.length >= k) seeds
        else Array.tabulate(k)(i => seeds(i % seeds.length))
      lloyd(spark, idRdd.map(_._2), init, iters)
    } finally idRdd.unpersist()
  }

  /** Mean squared distance of every vector to its nearest centroid — the
    * k-means objective, for comparing quantizer quality.
    */
  def cost(spark: SparkSession, vecs: DataFrame, centroids: Array[Array[Double]]): Double = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val (sum, n) = vecs.select(col("v")).as[Seq[Double]].rdd
      .map { sv =>
        val v = sv.toArray
        val cv = bc.value(nearest(bc.value, v))
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        (d, 1L)
      }
      .treeAggregate((0.0, 0L))((a, x) => (a._1 + x._1, a._2 + x._2),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    sum / math.max(1, n)
  }
}
