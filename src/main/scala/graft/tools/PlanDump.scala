package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registry queries to files — the
  * optimization-round evidence artifact (plans/r16/<query>_{before,after}.txt).
  * Usage:
  *   tools/run.sh graft.tools.PlanDump <sfdir> <outdir> <suffix> [q1,q2,...]
  * With no query list, dumps every registry query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = Paths.get(args(1))
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keySet.toSeq.sorted
    Files.createDirectories(out)
    val spark = graft.GraftSession.get()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(out.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      System.err.println(s"plan: $name (${txt.length} chars)")
    }
    spark.stop()
  }
}
