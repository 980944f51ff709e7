package graft.tools

/** Temporary plan probe (dev utility). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (name <- Seq("q43", "q41", "q42")) {
      val mk = () => name match {
        case "q43" => graft.operators.DedupOps.simhash(spark, d)
        case "q41" => graft.operators.DedupOps.ngramJaccard(spark, d)
        case "q42" => graft.operators.DedupOps.minhashLsh(spark, d)
      }
      mk().count()
      val t = (1 to 2).map { _ => val t0 = System.nanoTime(); mk().count(); (System.nanoTime()-t0)/1e9 }.min
      println(name + ": " + t)
    }
    spark.stop()
  }
}
