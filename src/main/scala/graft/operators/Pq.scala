package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization training (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split the embedding space into
  * `m` contiguous subspaces and train an independent k-means codebook per
  * subspace. A vector then compresses to m small codes (m=8, k=16 → 4 bits
  * per code, 4 bytes per 64-dim vector — 64× smaller than float32), which
  * is what makes billion-vector ANN indexes fit in memory at 100 TB corpus
  * scale.
  *
  * Training reuses [[Kmeans.train]] per subspace — each run is the same
  * shuffle-free broadcast + treeAggregate loop over the corpus, reading
  * only that subspace's slice.
  */
object Pq {

  /** Train `m` codebooks of `k` centroids each over `vecs` (columns
    * `id: long`, `v: array<double>` of length `dim`). Deterministic for a
    * fixed seed; subspace s uses seed + s so codebooks are independent.
    */
  def train(spark: SparkSession, vecs: DataFrame, dim: Int, m: Int, k: Int,
            iters: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Array.tabulate(m) { sub =>
      val subv = vecs.select(col("id"), slice(col("v"), sub * subDim + 1, subDim).as("v"))
      Kmeans.train(spark, subv, k, iters, seed + sub)
    }
  }
}
