package graft

/** Dev utility (test scope): print the physical-plan skeleton — joins,
  * exchanges, windows, generators, aggregates — of named driver queries.
  *
  * Usage: sbt 'Test/runMain graft.PlanAudit <sfDir> <query>...'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <query>...")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    for (q <- args.tail) {
      val p = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(s"=== $q")
      println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Window") ||
        l.contains("Generate") || l.contains("HashAggregate")).mkString("\n"))
    }
    spark.stop()
  }
}
