package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan/timing probe: run one registry query against a lake and
  * print the formatted physical plan plus wall/CPU. Usage:
  *   tools/run.sh graft.tools.Probe <name> <sfdir> [explainOnly]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = graft.GraftSession.get()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(20000))
    if (args.length < 3) {
      val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime()
      val c1 = bean.getProcessCpuTime
      println(f"PROBE wall ${(t1 - t0) / 1e9}%.2f s cpu ${(c1 - c0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
