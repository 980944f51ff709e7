package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions._
import graft.operators.{IvfCentroids, PqCodebooks, SimilarityOps}

/** Persisted IVFADC index as a partitioned lake table — the build-once /
  * query-many serving shape a production vector index actually runs
  * (q70b recomputes coarse and code assignment inside every query; real
  * corpora assign once at ingest and amortize over every search).
  *
  *   <out>/list_id=<L>/part-*.parquet    rows (vec_id, codes[8])
  *
  * Build: one corpus scan — coarse-assign each vector to its nearest
  * trained centroid (broadcast table, map-side max_by argmax) and
  * PQ-encode it to 8 sub-codes (broadcast codebooks, map-side min_by
  * argmin), written `partitionBy(list_id)`. The parquet carries ONLY
  * codes — 8 small ints a codec packs to ~4 bytes/vector, the compression
  * that fits 10⁹ vectors in a cluster's page cache; the float embeddings
  * are never read again at query time.
  *
  * Search: probes become PARTITION PRUNING. The query's nProbe nearest
  * lists resolve driver-side (a handful of (q_id, list_id) pairs), and
  * `list_id IN (...)` prunes the scan to the probed directories before a
  * single file opens — at 16 lists / 2 probes the planner reads ≤ 1/8 of
  * the index, and the fraction falls as nlists grows. Scoring is the
  * asymmetric-distance LUT: per (query, subspace, code) distances — 8×16
  * rows per query — computed once and broadcast, so each candidate costs
  * 8 lookup-adds, in the same fixed conditional-sum order as q70b
  * (SimilarityOps.knnIvfPq), making results bit-identical to the
  * recompute-everything query (spec-pinned).
  *
  * Reference counterpart: none — the reference pipeline has no vector
  * index; this extends the ANN family (q45/q46/q46b/q70/q70b) with the
  * lake-layout half a 100 TB deployment needs.
  */
object AnnIndexBuild {

  private val SubDim = 8
  private val NSub = 8

  private def codebooksDf(s: SparkSession): DataFrame = {
    import s.implicits._
    PqCodebooks.values.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cv, code) => (sub.toLong, code.toLong, cv.toSeq) }
    }.toSeq.toDF("sub_idx", "code", "cv")
  }

  /** One pass over the corpus embeddings -> the partitioned code table. */
  def build(s: SparkSession, sfDir: String, out: String): Unit = {
    val e = Tables.embeddings(s, sfDir)
      .filter(col("vec_id") >= 10)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    // coarse assignment: nearest trained centroid, map-side argmax
    val listed = e.join(broadcast(SimilarityOps.centroidTable(s)))
      .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("v"), col("list_id")),
        struct(col("csim"), -col("list_id"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.list_id").as("list_id"))
    // PQ encoding: per-subspace nearest codebook entry, map-side argmin
    // (same (sqd, code) total order as q70/q70b, so codes are identical)
    val subs = listed.select(col("vec_id"), col("list_id"),
      explode(array((0 until NSub).map(sub =>
        struct(lit(sub.toLong).as("sub_idx"),
          slice(col("v"), sub * SubDim + 1, SubDim).as("sv"))): _*)).as("e"))
      .select(col("vec_id"), col("list_id"), col("e.sub_idx").as("sub_idx"), col("e.sv").as("sv"))
    val coded = subs.join(broadcast(codebooksDf(s)), Seq("sub_idx"))
      .withColumn("sqd",
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)"))
      .groupBy("vec_id", "list_id", "sub_idx")
      .agg(min_by(col("code"), struct(col("sqd"), col("code"))).as("code"))
      .groupBy("vec_id", "list_id")
      // array_sort on (sub_idx, code) pairs -> codes[i] is subspace i's
      // code regardless of aggregation order
      .agg(transform(array_sort(collect_list(struct(col("sub_idx"), col("code")))),
        x => x.getField("code")).as("codes"))
    coded
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
  }

  /** ADC top-k over the prebuilt index; bit-identical to
    * SimilarityOps.knnIvfPq on the same corpus + frozen constants. */
  def search(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = 2): DataFrame = {
    val queries = Tables.embeddings(s, sfDir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    // probe resolution: nProbe nearest lists per query. The result is
    // nQueries x nProbe rows — a bounded driver-side set by construction
    // (the query batch, not the corpus), collected so the probed list ids
    // become a LITERAL partition filter the planner prunes directories by.
    val wProbe = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("list_id"))
    val probes = queries.join(broadcast(SimilarityOps.centroidTable(s)))
      .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val probedLists = probes.map(_._2).distinct.sorted

    // per-query ADC lookup table: ||qsv - codebook(sub, code)||² for all
    // 8x16 cells — built from the query batch alone, broadcast everywhere
    val qsubs = queries.select(col("vec_id").as("q_id"),
      explode(array((0 until NSub).map(sub =>
        struct(lit(sub.toLong).as("sub_idx"),
          slice(col("v"), sub * SubDim + 1, SubDim).as("qsv"))): _*)).as("e"))
      .select(col("q_id"), col("e.sub_idx").as("sub_idx"), col("e.qsv").as("qsv"))
    val lut = qsubs.join(broadcast(codebooksDf(s)), Seq("sub_idx"))
      .withColumn("dsub",
        expr("aggregate(zip_with(qsv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)"))
      .select("q_id", "sub_idx", "code", "dsub")

    import s.implicits._
    val probePairs = probes.toSeq.toDF("q_id", "list_id")
    // the pruned scan: list_id is a partition column, the IN-list a
    // literal — only probed directories are ever listed or opened
    val candidates = s.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists: _*))
      .select(col("vec_id"), col("list_id"),
        posexplode(col("codes")).as(Seq("sub_idx", "code")))
      .join(broadcast(probePairs), Seq("list_id"))
      .join(broadcast(lut), Seq("q_id", "sub_idx", "code"))
    val perSub = (0 until NSub).map(sub =>
      sum(when(col("sub_idx") === sub.toLong, col("dsub"))).as(s"d$sub"))
    val wr = Window.partitionBy("q_id").orderBy(col("adc_dist").asc, col("neighbor_id"))
    candidates
      .groupBy(col("q_id"), col("vec_id").as("neighbor_id"))
      .agg(perSub.head, perSub.tail: _*)
      .withColumn("adc_dist", (0 until NSub).map(sub => col(s"d$sub")).reduce(_ + _))
      .select("q_id", "neighbor_id", "adc_dist")
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnnIndexBuild <sf-dir> <index-out-dir>")
    val spark = GraftSession.get()
    build(spark, args(0), args(1))
    spark.stop()
  }
}
