package graft.jobs

import graft.GraftSession
import graft.operators.Pca

/** Offline trainer for the frozen [[graft.operators.PcaComponents]]
  * artifact: runs the full power iteration on the given lake and prints
  * the component as Scala source — `run PcaTrain <sfDir>`, paste the
  * output over the checked-in file. Values print via Double.toString
  * (shortest round-trip), so the committed literals are the EXACT bits
  * the deterministic recompute produces — q92's parity is equality, not
  * tolerance.
  */
object PcaTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt
      else graft.operators.PcaComponents.K
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (comps, n) = Pca.topComponents(spark, sfDir, k,
      graft.operators.PcaComponents.Iters)
    val (v, lambda) = comps.head
    println(s"  val Iters: Int = ${graft.operators.PcaComponents.Iters}")
    println(s"  val Eigenvalue: Double = $lambda")
    println(s"  val N: Long = ${n}L")
    println(s"  val values: Seq[Double] = Seq(")
    v.grouped(4).foreach(g => println("    " + g.mkString(", ") + ","))
    println("  )")
    println(s"  val K: Int = $k")
    println(s"  val componentsK: Seq[(Double, Seq[Double])] = Seq(")
    comps.foreach { case (u, lam) =>
      println(s"    ($lam, Seq(")
      u.grouped(4).foreach(g => println("      " + g.mkString(", ") + ","))
      println("    )),")
    }
    println("  )")
    spark.stop()
  }
}
