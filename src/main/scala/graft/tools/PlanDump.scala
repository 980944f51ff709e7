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
    // same env-driven session shape as Bench (SPARK_GRAFT_CPUS /
    // SPARK_GRAFT_SHUFFLE_PARTITIONS / SPARK_GRAFT_EXTRA_CONF): committed
    // plan evidence must match the configuration the bench actually ran —
    // a fixed local[32] session here could dump plans AQE would shape
    // differently under the benched knobs (advisor finding, round 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .map(_.toInt).getOrElse(cpus.toInt)
    val spark = graft.GraftSession
      .builderWithEnv(s"local[$cpus]", shuffleParts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
