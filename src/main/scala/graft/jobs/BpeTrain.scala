package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}
import graft.operators.Bpe

/** Offline BPE tokenizer training entry point — the TrainQuantizers
  * pattern for the merge table: `run BpeTrain <sfDir> [rounds]` runs the
  * distributed trainer (graft.operators.Bpe.train) and prints the merge
  * sequence as Scala source; paste the output over
  * `operators/BpeMerges.scala`. Committed so the frozen artifact's
  * provenance is a runnable recipe, not folklore.
  */
object BpeTrain {

  private def q(x: String): String = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeTrain <sf-dir> [rounds]")
    val rounds = if (args.length > 1) args(1).toInt else graft.operators.BpeMerges.Rounds
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = Bpe.train(spark, Tables.documents(spark, args(0)), rounds)
    println(s"// BpeMerges.values (trained on ${args(0)}, rounds = $rounds):")
    merges.foreach(m => println(s"    (${m.rank}, ${q(m.left)}, ${q(m.right)}, ${m.n}L),"))
    spark.stop()
  }
}
