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

  test("q92b recovers two planted directions in variance order, near-orthogonal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pcaplant2").toString
    val dims = 16
    // coordinate 7 carries ~4x the variance of coordinate 3; both dwarf
    // the jitter — a decaying spectrum, where the fixed iteration budget
    // converges sharply (unlike the near-isotropic gate corpus)
    (0 until 200).map { i =>
      val a = ((i % 21) - 10).toDouble            // sd ~6
      val b = (((i * 7) % 13) - 6).toDouble / 2.0 // sd ~1.9, decorrelated
      val v = (0 until dims).map { k =>
        val eps = (((i * 31 + k * 17) % 19) - 9) / 90.0
        (if (k == 7) a else if (k == 3) b else 0.0) + eps
      }.map(_.toFloat)
      (i.toLong, v, 1)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val (comps, n) = Pca.topComponents(spark, dir, k = 2, iters = 16)
    assert(n === 200L)
    val (u1, l1) = comps(0)
    val (u2, l2) = comps(1)
    assert(l1 > l2, s"eigenvalues out of order: $l1 <= $l2")
    assert(math.abs(u1(7)) > 0.99, s"rank 1 missed the planted axis: ${u1(7)}")
    assert(math.abs(u2(3)) > 0.99, s"rank 2 missed the planted axis: ${u2(3)}")
    val d12 = u1.zip(u2).map { case (a, b) => a * b }.sum
    assert(math.abs(d12) < 1e-3, s"components not orthogonal: $d12")
    comps.foreach { case (u, _) => assert(math.abs(normSq(u) - 1.0) < 1e-12) }
  }

  test("q92b rank 1 is bit-identical to q92; the frozen K artifact is in sync") {
    // same lake as the q92 artifact test — one distributed run covers both
    val (comps, n) = Pca.topComponents(spark, "/root/testdata/sf0.01")
    assert(n === PcaComponents.N)
    val (v1, l1) = comps.head
    assert(l1 === PcaComponents.Eigenvalue)
    assert(v1.toSeq === PcaComponents.values)
    assert(comps.map { case (u, lam) => (lam, u.toSeq) } === PcaComponents.componentsK)
    // the shipped spectrum is a sorted spectrum: a consumer treating
    // componentsK as "top K" must see non-increasing eigenvalues — both
    // in the live recompute and in the frozen artifact itself
    assert(comps.map(_._2).sliding(2).forall(p => p.head >= p.last),
      s"recomputed spectrum not non-increasing: ${comps.map(_._2)}")
    assert(PcaComponents.componentsK.map(_._1).sliding(2).forall(p => p.head >= p.last),
      "frozen componentsK not non-increasing")
    // every rank is unit-norm; orthogonality on this near-isotropic corpus
    // is convergence-bounded (documented), so only sanity-bound it
    comps.foreach { case (u, _) => assert(math.abs(normSq(u) - 1.0) < 1e-12) }
    for (i <- comps.indices; j <- comps.indices if i < j) {
      val d = comps(i)._1.zip(comps(j)._1).map { case (a, b) => a * b }.sum
      assert(math.abs(d) < 0.2, s"ranks $i,$j wildly non-orthogonal: $d")
    }
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
