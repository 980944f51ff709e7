package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

/** The scale-evidence generator's statistical-shape contract — in
  * particular STACKING safety (round 16): applying ScaleUp to its own
  * output must not re-correlate replicas. The round-16 decade bench
  * caught the original bug the hard way: replica 0 kept text verbatim,
  * so a stacked sf0.1→sf1→sf10 lake made the (a=k, b=0) and (a=0, b=k)
  * copies of every doc token-identical — q41c read 29.4× output pairs
  * for 10× docs, phantom superlinearity manufactured by the DATASET.
  */
class ScaleUpSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private def stackedLakes(): (String, String) = {
    val a = java.nio.file.Files.createTempDirectory("scaleA").toString
    val b = java.nio.file.Files.createTempDirectory("scaleB").toString
    ScaleUp.run(spark, src, a, 2)
    ScaleUp.run(spark, a, b, 2) // stacked: 4 replica PATHS of the source
    (a, b)
  }

  test("stacked documents: replica token namespaces stay DISJOINT — " +
    "distinct tokens scale exactly with the replica-path count") {
    val (a, b) = stackedLakes()
    def tokens(dir: String): Long =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("t"))
        .select(countDistinct(col("t"))).head.getLong(0)
    def rows(dir: String): Long =
      spark.read.parquet(s"$dir/documents.parquet").count()
    val (tSrc, tA, tB) = (tokens(src), tokens(a), tokens(b))
    assert(rows(a) === 2 * rows(src) && rows(b) === 4 * rows(src))
    // the old replica-0-verbatim bug collapsed (a=k,b=0) onto (a=0,b=k):
    // distinct tokens then read < paths × source
    assert(tA === 2 * tSrc, s"single pass: $tA tokens vs ${2 * tSrc} expected")
    assert(tB === 4 * tSrc, s"stacked pass: $tB tokens vs ${4 * tSrc} expected")
    // doc ids unique; n_chars matches the rewritten text
    val docs = spark.read.parquet(s"$b/documents.parquet")
    assert(docs.select("doc_id").distinct().count() === docs.count())
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() === 0L)
  }

  test("stacked embeddings: copies of one source vector decorrelate across " +
    "replica paths while within-replica geometry is preserved") {
    val (_, b) = stackedLakes()
    val emb = spark.read.parquet(s"$b/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(u: Array[Double], v: Array[Double]) =
      u.zip(v).map { case (x, y) => x * y }.sum
    def cos(u: Array[Double], v: Array[Double]) =
      dot(u, v) / math.sqrt(dot(u, u) * dot(v, v))
    // replica paths are contiguous id blocks in vec_id order (each pass
    // offsets by a pow10 base above the previous max, preserving order),
    // so sorted ids group into 4 source-sized blocks and the k-th id of
    // each block is a copy of the k-th source vector
    val bases = emb.keySet.toSeq.sorted
    val nSrc = srcEmb.size
    val ordered = bases.grouped(nSrc).toSeq
    assert(ordered.size === 4 && ordered.forall(_.size === nSrc))
    val srcOrdered = srcEmb.keySet.toSeq.sorted
    // cross-path copies of the same source vector: decorrelated
    for (k <- Seq(0, nSrc / 2, nSrc - 1)) {
      val copies = ordered.map(block => emb(block(k)))
      for (i <- copies.indices; j <- copies.indices if i < j) {
        assert(math.abs(cos(copies(i), copies(j))) < 0.9,
          s"copies $i/$j of source vec #$k re-correlated: cos=${cos(copies(i), copies(j))}")
      }
      // norms preserved (rotation + sign mask are isometries)
      val n0 = math.sqrt(dot(srcEmb(srcOrdered(k)), srcEmb(srcOrdered(k))))
      copies.foreach(c => assert(math.abs(math.sqrt(dot(c, c)) - n0) < 1e-4))
    }
    // within-replica geometry: pairwise dots inside each block equal the
    // source's (sign mask squares away; rotation permutes terms)
    val (u, v) = (srcOrdered(0), srcOrdered(1))
    val want = dot(srcEmb(u), srcEmb(v))
    ordered.foreach { block =>
      val got = dot(emb(block(0)), emb(block(1)))
      assert(math.abs(got - want) < 1e-4 * (1 + math.abs(want)),
        s"within-replica dot drifted: $got vs $want")
    }
  }
}
