package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A warmup query first (JIT + codegen cache + file
  * index), then deterministic name order so timings are comparable across
  * rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 32 — the driver's shape. A 4-CPU default produced phantom
    // "regressions" whenever a local bench forgot SPARK_GRAFT_CPUS.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table + exercise codegen once
    SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())
    // SPARK_GRAFT_ONLY=q29_bbox_iou,q44_dedup_embedding — targeted audits
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // best of 3: the first run pays codegen/JIT for this query's shape,
      // and the extra run tightens the noise floor (local totals otherwise
      // drift double-digit percent with host load — see SURVEY §6)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // release any persisted intermediates
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
