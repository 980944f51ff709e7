package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means for training the IVF coarse quantizer
  * (SimilarityOps.knnIvf) — the offline "train the index" step the
  * reference pipeline delegates to its ANN tooling.
  *
  * Shape: deterministic hash-seeded initialization (a reproducible uniform
  * draw — order by xxhash64(id, seed), take k), then Lloyd iterations where
  * each pass broadcasts the k x dim centroid matrix and aggregates per-
  * cluster sums with ONE treeAggregate over the corpus: no shuffle at all,
  * map-side partial sums only, k x (dim+1) doubles back to the driver per
  * iteration. This is the same execution scheme MLlib's KMeans uses, and it
  * scales to any corpus the executors can scan.
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

  /** Train k centroids on `vecs` (columns `id: long`, `v: array<double>`).
    * Deterministic for a fixed (k, iters, seed) and input set. Empty
    * clusters keep their previous centroid.
    */
  def train(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    import spark.implicits._
    val data = vecs.select(col("id").cast("long"), col("v")).as[(Long, Seq[Double])]
    var centroids = data
      .withColumn("r", xxhash64(col("id"), lit(seed)))
      .orderBy("r", "id").limit(k)
      .select("v").as[Seq[Double]].collect().map(_.toArray)
    require(centroids.length == k, s"corpus smaller than k=$k")
    val dim = centroids(0).length
    val rdd = data.rdd.map(_._2.toArray).cache()
    try {
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
    } finally rdd.unpersist()
    centroids
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
