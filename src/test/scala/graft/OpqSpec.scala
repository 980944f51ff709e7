package graft

import org.apache.spark.sql.functions._

import graft.operators.{Opq, OpqModel, OpqResidualModel, PqCodebooks, PqResidualCodebooks, SimilarityOps}

class OpqSpec extends SparkSpec {

  private val gate = "/root/testdata/sf0.01"

  // deterministic random orthogonal matrix: Gram–Schmidt of a seeded
  // gaussian-ish matrix (test scaffolding only)
  private def randOrtho(n: Int, seed: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    val cols = Array.fill(n)(Array.fill(n)(rng.nextGaussian()))
    for (j <- 0 until n) {
      for (jj <- 0 until j) {
        var dot = 0.0
        for (i <- 0 until n) dot += cols(j)(i) * cols(jj)(i)
        for (i <- 0 until n) cols(j)(i) -= dot * cols(jj)(i)
      }
      val nrm = math.sqrt(cols(j).map(x => x * x).sum)
      for (i <- 0 until n) cols(j)(i) /= nrm
    }
    // cols(j) is column j; return row-major M(i)(j) = cols(j)(i)
    Array.tabulate(n, n)((i, j) => cols(j)(i))
  }

  test("svdRotation recovers the analytic Procrustes optimum V·Uᵀ") {
    // G = U·S·Vᵀ with known factors and DISTINCT singular values → the
    // orthogonal maximizer of tr(R·G) is uniquely V·Uᵀ
    val n = 8
    val u = randOrtho(n, 1); val v = randOrtho(n, 2)
    val s = Array.tabulate(n)(i => 10.0 - i) // distinct, positive
    // G(i)(j) = Σ_l U(i)(l)·s(l)·V(j)(l)
    val g = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(l => u(i)(l) * s(l) * v(j)(l)).sum)
    val r = Opq.svdRotation(g)
    // the optimum R = V·Uᵀ: R(i)(j) = Σ_l V(i)(l)·U(j)(l)
    val want = Array.tabulate(n, n)((i, j) => (0 until n).map(l => v(i)(l) * u(j)(l)).sum)
    for (i <- 0 until n; j <- 0 until n)
      assert(math.abs(r(i)(j) - want(i)(j)) < 1e-8, s"R($i)($j)")
  }

  test("svdRotation output is orthogonal even on rank-deficient G") {
    val n = 6
    val u = randOrtho(n, 3); val v = randOrtho(n, 4)
    val s = Array(5.0, 4.0, 3.0, 0.0, 0.0, 0.0) // rank 3
    val g = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(l => u(i)(l) * s(l) * v(j)(l)).sum)
    val r = Opq.svdRotation(g)
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(l => r(i)(l) * r(j)(l)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRᵀ($i)($j)")
    }
  }

  test("frozen OpqModel rotation is orthogonal; rotateKernel preserves norms and matches the driver matvec") {
    val r = OpqModel.rotation
    assert(r.length === 64)
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(l => r(i)(l) * r(j)(l)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRᵀ($i)($j)")
    }
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(64)(rng.nextDouble() - 0.5)))
    val rotated = SimilarityOps.rotateKernel(spark, vecs.toDF("vec_id", "v"), r)
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = Opq.matvec(r, v.toArray)
      assert(rotated(id).toArray.toSeq === want.toSeq, s"vec $id")
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val n1 = math.sqrt(want.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"norm drift vec $id") // orthogonality in action
    }
  }

  test("live OPQ training reproduces the frozen gate artifact bit-exactly") {
    // the generated-oracle contract behind q70d (the ImiCodebooks
    // pattern): DuckDB replays rotation + assignment from OpqModel, the
    // engine trains deterministically — parity only means anything if
    // these are THE SAME doubles (refreeze via TrainQuantizers --opq)
    val (r, books) = SimilarityOps.opqTrain(spark, gate)
    assert(r.length === OpqModel.rotation.length)
    r.indices.foreach { i =>
      assert(r(i).toSeq === OpqModel.rotation(i).toSeq, s"rotation row $i drifted from the freeze")
    }
    assert(books.length === OpqModel.books.length)
    for (sub <- books.indices; code <- books(sub).indices)
      assert(books(sub)(code).toSeq === OpqModel.books(sub)(code).toSeq,
        s"codebook ($sub, $code) drifted from the freeze")
  }

  test("live OPQ-residual training reproduces the frozen gate artifact bit-exactly") {
    // q70e's artifact (the OpqModel contract on the RESIDUAL space —
    // refreeze via TrainQuantizers --opq-res)
    val (r, books) = SimilarityOps.opqResTrain(spark, gate)
    assert(r.length === OpqResidualModel.rotation.length)
    r.indices.foreach { i =>
      assert(r(i).toSeq === OpqResidualModel.rotation(i).toSeq,
        s"residual rotation row $i drifted from the freeze")
    }
    for (sub <- books.indices; code <- books(sub).indices)
      assert(books(sub)(code).toSeq === OpqResidualModel.books(sub)(code).toSeq,
        s"residual codebook ($sub, $code) drifted from the freeze")
  }

  test("OPQ-residual distortion never exceeds plain residual PQ at the same code budget") {
    // q70e vs q70c coding quality on the distribution both actually
    // quantize: the frozen-quantizer residuals
    val res = SimilarityOps.residualTrainFrame(spark, gate)
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val pqr = Opq.distortion(spark, res, eye, PqResidualCodebooks.values)
    val opqr = Opq.distortion(spark, res, OpqResidualModel.rotation, OpqResidualModel.books)
    info(f"residual-PQ distortion $pqr%.6f vs OPQ-residual $opqr%.6f (${(1 - opqr / pqr) * 100}%.2f%% lower)")
    assert(opqr <= pqr * (1 + 1e-6), s"OPQ-residual $opqr worse than residual PQ $pqr")
  }

  test("OPQ distortion never exceeds plain PQ at the same code budget (the training objective)") {
    // alternating minimization starts near the PQ solution (R = I with
    // sampled-init books) and every step is monotone non-increasing, so
    // the frozen model must sit at-or-below plain PQ's reconstruction
    // error on the corpus it was trained on. On a near-isotropic corpus
    // the gap may be small — the pin is "never worse", the measured gap
    // is reported for the curious.
    val corpus = Tables.embeddings(spark, gate)
      .filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val pq = Opq.distortion(spark, corpus, eye, PqCodebooks.values)
    val opq = Opq.distortion(spark, corpus, OpqModel.rotation, OpqModel.books)
    info(f"PQ distortion $pq%.6f vs OPQ $opq%.6f (${(1 - opq / pq) * 100}%.2f%% lower)")
    assert(opq <= pq * (1 + 1e-6), s"OPQ $opq worse than PQ $pq")
  }
  test("graft_sqdist is bit-identical to the HOF aggregate chain it replaced, any lengths") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // mixed widths incl. the ADC 8-dim subvector and the IMI 32-dim half
    val rows = (0 until 200).map { i =>
      val n = Seq(1, 8, 32, 64)(i % 4)
      (i.toLong, Seq.fill(n)(rng.nextDouble() * 20 - 10), Seq.fill(n)(rng.nextDouble() * 20 - 10))
    }
    val out = rows.toDF("id", "a", "b")
      .withColumn("native", call_function("graft_sqdist", col("a"), col("b")))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)"))
      .select("id", "native", "hof").collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id ${r.getLong(0)}")
    }
    // the HOF null contract carries over: length mismatch and null
    // elements read NULL (a corrupt embedding must surface, never
    // silently compete with a truncated partial distance)
    val edge = Seq(
      (0L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("id", "a", "b")
      .withColumn("native", call_function("graft_sqdist", col("a"), col("b")))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)"))
      .collect()
    edge.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("native")), s"id ${r.getLong(0)} native")
      assert(r.isNullAt(r.fieldIndex("hof")), s"id ${r.getLong(0)} hof")
    }
  }

}
