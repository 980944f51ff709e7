package graft

import org.apache.spark.sql.functions._

import graft.jobs.CorpusPrep
import graft.operators.DedupOps

/** End-to-end corpus-preparation job: raw documents -> curated chunked
  * lake + attrition report.
  */
class CorpusPrepSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("corpusprep").toString
    CorpusPrep.run(spark, sf, dir)
    dir
  }

  test("attrition is monotone and the report matches the tables") {
    val stats = spark.read.parquet(s"$out/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("00_input") === Tables.documents(spark, sf).count())
    assert(stats("00_input") >= stats("01_quality_gate"))
    assert(stats("01_quality_gate") >= stats("02_exact_dedup"))
    assert(stats("02_exact_dedup") >= stats("03_neardup_groups"))
    assert(stats("03_neardup_groups") === spark.read.parquet(s"$out/documents").count())
    assert(stats("04_chunks") === spark.read.parquet(s"$out/chunks").count())
    assert(stats("03_neardup_groups") > 0)
  }

  test("kept documents pass the gates and contain no duplicates of any kind") {
    val docs = spark.read.parquet(s"$out/documents")
    assert(docs.filter(col("n_tokens") < 5 || col("dup_rate") > 0.6).count() === 0)
    // exact: content hashes unique
    assert(docs.select(md5(col("text").cast("binary"))).distinct().count() === docs.count())
    // near-dup: no two kept docs share a MinHash connected component
    val canon = DedupOps.dedupGroups(spark, sf)
      .select(col("doc_id"), col("canonical"))
    val perComponent = docs.join(canon, "doc_id")
      .groupBy("canonical").count().filter(col("count") > 1).count()
    assert(perComponent === 0, "two kept docs share a near-dup component")
  }

  test("chunks cover every kept doc and respect the window") {
    val docs = spark.read.parquet(s"$out/documents")
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.select("doc_id").distinct().count() === docs.count())
    assert(chunks.filter(col("n_chunk_tokens") < 1 || col("n_chunk_tokens") > 32).count() === 0)
    // chunk_no 0 exists for every doc; text token count matches the recorded one
    assert(chunks.filter(col("chunk_no") === 0).count() === docs.count())
    val bad = chunks
      .withColumn("actual", size(split(col("chunk_text"), " ")).cast("long"))
      .filter(col("actual") =!= col("n_chunk_tokens"))
    assert(bad.count() === 0)
  }
}
