package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, PcaComponents}

/** Distributed PCA power iteration (q92): planted-direction recovery,
  * bit-exact driver-side recompute (carrier replicated), artifact sync.
  */
class PcaSpec extends SparkSpec {

  test("q92 recovers a planted dominant direction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pcaplant").toString
    val dims = 16
    // vectors = a*e7 + eps: coordinate 7 carries ~100x the variance of
    // the deterministic per-coordinate jitter
    (0 until 200).map { i =>
      val a = ((i % 21) - 10).toDouble // in [-10, 10]
      val v = (0 until dims).map { k =>
        val eps = (((i * 31 + k * 17) % 19) - 9) / 90.0 // in [-0.1, 0.1]
        (if (k == 7) a else 0.0) + eps
      }.map(_.toFloat)
      (i.toLong, v, 1)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val (v, lambda, n) = Pca.topComponent(spark, dir, iters = 12)
    assert(n === 200L)
    assert(math.abs(v(7)) > 0.99, s"planted axis not found: ${v.mkString(",")}")
    assert(math.abs(normSq(v) - 1.0) < 1e-9)
    // eigenvalue ~ variance of a (uniform over -10..10 -> ~36.7); the
    // jitter adds < 1
    assert(lambda > 30 && lambda < 45, s"eigenvalue $lambda")
    // canonical sign: the dominant coordinate is positive
    assert(v(7) > 0)
  }

  test("q92 matches a driver-side recompute with the carrier replicated, bit-near") {
    val xs = Tables.embeddings(spark, sf)
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .collect().map(_.getAs[scala.collection.Seq[Double]](0).toArray)
    val n = xs.length
    val dims = xs.head.length
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // mean through the carrier (davg: exact sum -> double, one division)
    val mu = (0 until dims).map { p =>
      (xs.map(x => q6(x(p))).sum.toDouble) / n
    }.toArray
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var lambda = 0.0
    for (_ <- 1 to PcaComponents.Iters) {
      var muDotV = 0.0
      for (i <- 0 until dims) muDotV += mu(i) * v(i)
      val s = xs.map { x =>
        var acc = 0.0
        var i = 0
        while (i < dims) { acc += x(i) * v(i); i += 1 }
        acc - muDotV
      }
      val w = (0 until dims).map { p =>
        val sx = xs.indices.map(i => q6(s(i) * xs(i)(p))).sum.toDouble
        val ss = xs.indices.map(i => q6(s(i))).sum.toDouble
        (sx - ss * mu(p)) / n
      }.toArray
      lambda = math.sqrt(normSq(w))
      v = w.map(_ / lambda)
    }
    val am = v.indices.maxBy(i => math.abs(v(i)))
    if (v(am) < 0) v = v.map(x => -x)

    val (got, gotLambda, _) = Pca.topComponent(spark, sf)
    for (p <- 0 until dims)
      assert(math.abs(got(p) - v(p)) < 1e-12, s"dim $p: ${got(p)} vs ${v(p)}")
    assert(math.abs(gotLambda - lambda) < 1e-12)
  }

  test("the frozen artifact is in sync with a retrain on the gate lake") {
    // the q92 oracle compares against PcaComponents — this catches a code
    // change that silently alters the iteration without a retrain. The
    // artifact's lake is the sf0.01 correctness gate, not this suite's sf.
    val (v, lambda, n) = Pca.topComponent(spark, "/root/testdata/sf0.01")
    assert(n === PcaComponents.N)
    assert(lambda === PcaComponents.Eigenvalue)
    assert(v.toSeq === PcaComponents.values)
  }

  private def normSq(v: Array[Double]): Double = v.map(x => x * x).sum
}
