package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}
import graft.operators.{Clf, ClfWeights}

/** Offline quality-classifier training entry point — the BpeTrain pattern
  * for the logistic weights: `run ClfTrain <sfDir> [rounds]` runs the
  * distributed trainer (graft.operators.Clf.train) and prints the model as
  * Scala source; paste the output over `operators/ClfWeights.scala`.
  * Committed so the frozen artifact's provenance is a runnable recipe.
  */
object ClfTrain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClfTrain <sf-dir> [rounds] [lr] [sampleFrac]")
    val rounds = if (args.length > 1) args(1).toInt else ClfWeights.Rounds
    val lr = if (args.length > 2) args(2).toDouble else ClfWeights.LearningRate
    // sampleFrac < 1: train on the q94b stratified hash-line sample (all
    // reference docs + sampleFrac of the background — see
    // Clf.sampledTrainSet), but DIAGNOSE on the full lake: the sampled
    // model's job is to score everything, so its evidence is full-lake AUC
    val sample = if (args.length > 3) args(3).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, args(0))
    val trainDocs = if (sample >= 1.0) docs else Clf.sampledTrainSet(docs, sample)
    val m = Clf.train(spark, trainDocs, rounds = rounds, lr = lr)
    // training-set diagnostics so the dial freeze is evidence, not vibes
    val scored = Clf.scoreOf(docs, m, ClfWeights.Buckets)
      .select("source", "logit").collect()
    val (ref, rest) = scored.partition(_.getString(0) == ClfWeights.RefSource)
    val mRef = ref.map(_.getDouble(1)).sum / ref.length
    val mRest = rest.map(_.getDouble(1)).sum / rest.length
    val auc = {
      val rs = ref.map(_.getDouble(1)); val bs = rest.map(_.getDouble(1))
      val wins = rs.map(r => bs.count(_ < r) + 0.5 * bs.count(_ == r)).sum
      wins / (rs.length.toDouble * bs.length)
    }
    val acc = scored.count(r =>
      (r.getDouble(1) > 0) == (r.getString(0) == ClfWeights.RefSource)
    ).toDouble / scored.length
    val refRecall = ref.count(_.getDouble(1) > 0).toDouble / ref.length
    println(f"// rounds=$rounds lr=$lr sample=$sample meanRef=$mRef%.4f meanRest=$mRest%.4f " +
      f"auc=$auc%.4f acc=$acc%.4f refRecall=$refRecall%.4f")
    println(s"// ClfWeights trained on ${args(0)}, rounds = $rounds, sample = $sample:")
    println(s"  val Bias: Double = ${m.bias}")
    println(s"  val values: Seq[(Int, Double)] = Seq(")
    m.weights.foreach { case (b, w) => println(s"    ($b, $w),") }
    println(s"  )")
    spark.stop()
  }
}
