package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions._
import graft.operators.{PqCodebooks, SimilarityOps}

/** Persisted IVFADC index as a partitioned lake table — the build-once /
  * query-many serving shape a production vector index actually runs
  * (q70b recomputes coarse and code assignment inside every query; real
  * corpora assign once at ingest and amortize over every search).
  *
  *   <out>/list_id=<L>/part-*.parquet    rows (vec_id, codes[8])
  *
  * Build: one corpus scan through `SimilarityOps.codedCorpusSubs` — THE
  * same coarse-argmax + PQ-argmin kernel q70b executes in-query, so the
  * persisted codes cannot drift from the in-query assignment — written
  * `partitionBy(list_id)`. The parquet carries ONLY codes — 8 small ints
  * a codec packs to ~4 bytes/vector, the compression that fits 10⁹
  * vectors in a cluster's page cache; the float embeddings are never
  * read again at query time.
  *
  * Search: probes become PARTITION PRUNING. ONE bounded query-side job
  * resolves each query's nProbe nearest lists AND collects the query
  * vectors (both sized by the query batch, never the corpus); the probed
  * list ids become a LITERAL `list_id IN (...)` filter that prunes the
  * scan to the probed directories before a single file opens — at 16
  * lists / 2 probes the planner reads ≤ 1/8 of the index, and the
  * fraction falls as nlists grows. Scoring is the asymmetric-distance
  * LUT: per (query, subspace, code) distances — 8×16 rows per query —
  * computed driver-side from the collected vectors in the same left-fold
  * IEEE order as q70b's `aggregate(zip_with(...))` chain and broadcast,
  * so each candidate costs 8 lookup-adds and results are bit-identical
  * to the recompute-everything query (spec-pinned).
  *
  * Reference counterpart: none — the reference pipeline has no vector
  * index; this extends the ANN family (q45/q46/q46b/q70/q70b) with the
  * lake-layout half a 100 TB deployment needs.
  */
object AnnIndexBuild {

  private val SubDim = 8
  private val NSub = 8

  /** One pass over the corpus embeddings -> the partitioned code table. */
  def build(s: SparkSession, sfDir: String, out: String): Unit = {
    SimilarityOps.codedCorpusSubs(s, sfDir)
      .groupBy("vec_id", "list_id")
      // array_sort on (sub_idx, code) pairs -> codes[i] is subspace i's
      // code regardless of aggregation order
      .agg(transform(array_sort(collect_list(struct(col("sub_idx"), col("code")))),
        x => x.getField("code")).as("codes"))
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
  }

  /** ADC top-k over the prebuilt index; bit-identical to
    * SimilarityOps.knnIvfPq on the same corpus + frozen constants. */
  def search(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = 2): DataFrame = {
    // probe resolution AND query-vector collection in one bounded job:
    // nQueries x nProbe rows, each carrying its query vector — sized by
    // the query batch, not the corpus. Collected so the probed list ids
    // become a LITERAL partition filter and the ADC LUT can be computed
    // driver-side without touching the embeddings table again.
    val wProbe = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("list_id"))
    val probeRows = Tables.embeddings(s, sfDir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .join(broadcast(SimilarityOps.centroidTable(s)))
      .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("list_id"), col("v"))
      .collect()
    val probes = probeRows.map(r => (r.getLong(0), r.getLong(1)))
    val probedLists = probes.map(_._2).distinct.sorted
    val queryVecs = probeRows.map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap

    // per-query ADC lookup table: ||qsv - codebook(sub, code)||² for all
    // 8x16 cells, computed locally from the collected query vectors. The
    // accumulation is the same left fold over (x-y)*(x-y) doubles as the
    // Catalyst `aggregate(zip_with(...), 0D, acc + z)` chain in q70b, so
    // every LUT cell is bit-identical to the in-query computation.
    val lutRows = for {
      (qid, v) <- queryVecs.toSeq
      sub <- 0 until NSub
      (cv, code) <- PqCodebooks.values(sub).zipWithIndex
    } yield {
      var acc = 0.0
      var i = 0
      while (i < SubDim) {
        val x = v(sub * SubDim + i) - cv(i)
        acc += x * x
        i += 1
      }
      (qid, sub.toLong, code.toLong, acc)
    }
    import s.implicits._
    val lut = lutRows.toDF("q_id", "sub_idx", "code", "dsub")
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
    require(args.length >= 2,
      "usage: AnnIndexBuild <sf-dir> <index-out-dir> [--search]")
    val spark = GraftSession.get()
    val t0 = System.nanoTime()
    build(spark, args(0), args(1))
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"job":"ann_index_build","build_sec":$buildSec%.3f}""")
    if (args.contains("--search")) {
      // timed amortization check: the serving read path over the
      // prebuilt index vs q70b's recompute-everything query. Two runs:
      // the first pays codegen/JIT, the second is the steady state a
      // serving loop sees.
      val times = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        val n = search(spark, args(1), args(0)).count()
        ((System.nanoTime() - t1) / 1e9, n)
      }
      println(f"""{"job":"ann_index_search","rows":${times.last._2},""" +
        f""""cold_sec":${times.head._1}%.3f,"warm_sec":${times.last._1}%.3f}""")
    }
    spark.stop()
  }
}
