package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}
import graft.operators.{Kmeans, Pq}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Offline index-training entry point: retrains the frozen quantizer
  * artifacts (IvfCentroids, PqCodebooks) and prints them as Scala source —
  * `run TrainQuantizers <sfDir>`, paste the output over the checked-in
  * files. Committed so the provenance comments on those files are a
  * runnable recipe, not folklore.
  */
object TrainQuantizers {

  private def fmt(x: Double): String = {
    // same 1e-6 rounding the frozen files document
    val r = math.rint(x * 1e6) / 1e6
    if (r == 0.0) "0.0" else r.toString
  }

  def main(args: Array[String]): Unit = {
    val auto = args.contains("--auto")
    val imi = args.contains("--imi")
    val opq = args.contains("--opq")
    val opqRes = args.contains("--opq-res")
    val sfDir = args.filterNot(_.startsWith("--")).head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (opq || opqRes) {
      // --opq / --opq-res: freeze the OPQ gate artifacts (OpqModel /
      // OpqResidualModel — rotation + rotated-space codebooks) at FULL
      // precision; the q70d/q70e parity constructions depend on bit
      // equality, exactly like --auto/--imi.
      val (r, books) =
        if (opqRes) graft.operators.SimilarityOps.opqResTrain(spark, sfDir)
        else graft.operators.SimilarityOps.opqTrain(spark, sfDir)
      val name = if (opqRes) "OpqResidualModel" else "OpqModel"
      println(s"// $name (dim 64, m 8, k 16, seed 42):")
      println("  val rotation: Array[Array[Double]] = Array(")
      r.foreach(row => println(s"    Array(${row.mkString(", ")}),"))
      println("  )")
      println("  val books: Array[Array[Array[Double]]] = Array(")
      books.foreach { book =>
        println("    Array(")
        book.foreach(cv => println(s"      Array(${cv.mkString(", ")}),"))
        println("    ),")
      }
      println("  )")
      spark.stop()
      return
    }

    if (imi) {
      // --imi: freeze the multi-index gate artifact (ImiCodebooks) at
      // FULL precision — the q46e parity construction depends on bit
      // equality, exactly like --auto's IvfCentroidsAuto.
      val (k, h1, h2) = graft.operators.SimilarityOps.imiQuantizer(spark, sfDir)
      println(s"// ImiCodebooks (K = $k per half, cells = ${k * k}):")
      println(s"  val k: Int = $k")
      println("  val half1: Array[Array[Double]] = Array(")
      h1.foreach(cv => println(s"    Array(${cv.mkString(", ")}),"))
      println("  )")
      println("  val half2: Array[Array[Double]] = Array(")
      h2.foreach(cv => println(s"    Array(${cv.mkString(", ")}),"))
      println("  )")
      spark.stop()
      return
    }

    if (auto) {
      // --auto: freeze the AUTO-k gate artifact (IvfCentroidsAuto) at
      // FULL precision — shortest-repr doubles round-trip bit-exactly in
      // both Scala source and DuckDB SQL literals, which the q46d parity
      // construction depends on (1e-6 display rounding would break the
      // live-trained == frozen spec).
      val (k, cents) = graft.operators.SimilarityOps.autoQuantizer(spark, sfDir)
      println(s"// IvfCentroidsAuto (k = $k):")
      println(s"  val k: Int = $k")
      println("  val values: Array[Array[Double]] = Array(")
      cents.foreach(cv => println(s"    Array(${cv.mkString(", ")}),"))
      println("  )")
      spark.stop()
      return
    }

    // the searchable corpus, same slice the IVF/PQ queries index
    val corpus = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= graft.operators.SimilarityOps.QueryIdMax)
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))

    val ivf = Kmeans.train(spark, corpus, k = 16, iters = 10, seed = 42L)
    println("// IvfCentroids.values:")
    ivf.foreach(cv => println(s"    Array(${cv.map(fmt).mkString(", ")}),"))

    val pq = Pq.train(spark, corpus, dim = 64, m = 8, k = 16, iters = 10, seed = 42L)
    println("// PqCodebooks.values:")
    pq.foreach { book =>
      println("    Array(")
      book.foreach(cv => println(s"      Array(${cv.map(fmt).mkString(", ")}),"))
      println("    ),")
    }

    // Residual codebooks (IVFADC proper, Jégou et al. §IV.A: PQ trained on
    // r = v - c(v), the vector MINUS its coarse centroid): assignment uses
    // the FROZEN shipped quantizer (SimilarityOps.centroidTable, cosine
    // argmax, smallest-list tie-break — the engine's one assignment
    // kernel), so after an IVF retrain paste IvfCentroids first and rerun
    // for the residual books. Same per-subspace recipe and seed as the raw
    // books — the only difference is WHAT is coded.
    // THE shared residual construction (SimilarityOps.residualTrainFrame
    // — listedFrame assignment), so this recipe and the OPQ-residual
    // trainer code residuals identically by construction
    val residuals = graft.operators.SimilarityOps.residualTrainFrame(spark, sfDir)
    val pqr = Pq.train(spark, residuals, dim = 64, m = 8, k = 16, iters = 10, seed = 42L)
    println("// PqResidualCodebooks.values:")
    pqr.foreach { book =>
      println("    Array(")
      book.foreach(cv => println(s"      Array(${cv.map(fmt).mkString(", ")}),"))
      println("    ),")
    }
    spark.stop()
  }
}
