package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data curation (SURVEY.md §2.C).
  *
  * Scale design: every variant avoids the all-pairs cross product —
  * exact dedup is one hash groupBy; n-gram and MinHash generate candidates
  * through inverted-index / LSH-bucket shuffles whose size is linear in
  * (rows x shingles|bands); embedding near-dup blocks on the label (ER
  * blocking) so pair generation stays within buckets.
  */
object DedupOps {

  /** q40 — exact duplicate groups by content hash (md5 is the portable
    * content key). One shuffle on the hash; at 100 TB this is the cheapest
    * possible dedup and the first pass before any fuzzy variant.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "text_hash", "n_copies")
      .orderBy("doc_id")

  /** Distinct hashed 3-gram shingle postings (doc_id, sh) — fully row-based:
    * posexplode tokens, hash each word once, combine the 3-gram with lead()
    * over the per-doc window. Every step is linear in token count and
    * whole-stage-codegen friendly; no nested higher-order functions (which
    * Catalyst may inline back into quadratic re-evaluation), and the posting
    * key is a long, which keeps shuffle bytes minimal at corpus scale.
    */
  private def shinglePostings(s: SparkSession, d: String): DataFrame = {
    val M = HashMod
    val w = Window.partitionBy("doc_id").orderBy("pos")
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos"), charHash(col("word")).as("wh"))
      .withColumn("wh2", lead(col("wh"), 1).over(w))
      .withColumn("wh3", lead(col("wh"), 2).over(w))
      .filter(col("wh3").isNotNull)
      .select(col("doc_id"),
        (((col("wh") * 1000003L + col("wh2")) % M) * 1000003L + col("wh3")) % M as "sh")
      .distinct()
  }

  /** q41 — n-gram Jaccard near-duplicate pairs via an inverted shingle
    * index: self-join postings on the shingle hash (no cross product),
    * count shared, Jaccard from per-doc shingle counts. Candidate volume is
    * bounded by shingle frequency — the classic posting-list bound.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // the posting table feeds four plan subtrees (two self-join sides, two
    // count joins); without an explicit persist Spark re-derives the whole
    // scan->hash->window pipeline for each — cache it once, executors keep
    // it memory-and-disk and evict LRU
    val posting = shinglePostings(s, d).persist()
    val counts = posting.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // note for real corpora: a df>1 prefilter on shingles before the
    // self-join is lossless (df=1 shingles cannot form pairs; the Jaccard
    // denominator still uses full counts) and prunes hard when most
    // shingles are unique — on this dense synthetic vocabulary it only
    // adds a pass, so it is not applied here
    val pairs = posting.as("a").join(posting.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    // counts is one row per doc (unbounded at corpus scale): no broadcast
    // hint, AQE decides from runtime size
    pairs
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard", col("shared") / (col("ca.n") + col("cb.n") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private val P = 2147483647L // minhash modulus (2^31 - 1)
  private val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = NumHashes / Bands

  /** q42 — MinHash + LSH banding. The signature (16 portable hashes -> 4
    * bands of 4) is computed map-side with higher-order functions — zero
    * shuffle until the band-bucket join, whose key cardinality is
    * rows x bands. This is the path that stays cheap when the corpus no
    * longer fits any pairwise approach.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    // signature = 16 min-aggregates over the shingle postings: partial
    // aggregation does the mins map-side, so the only shuffle is one row
    // per doc, then one per (doc, band).
    val withSigs = shinglePostings(s, d)
      .groupBy("doc_id")
      .agg(
        min((col("sh") * lit(1L) + lit(13L)) % P).as("sig_0"),
        (1 until NumHashes).map(i =>
          min((col("sh") * lit(2L * i + 1) + lit(7919L * i + 13)) % P).as(s"sig_$i")): _*)
    val bandCols = (0 until Bands).map { b =>
      val sigs = (0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}"))
      concat_ws(",", sigs: _*).as(s"band_$b")
    }
    val stacked = withSigs.select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id",
        s"stack(${Bands}, ${(0 until Bands).map(b => s"${b}L, band_$b").mkString(", ")}) as (band, sig)")
    val stackedP = stacked.persist() // both self-join sides read it
    stackedP.as("a").join(stackedP.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  private val SimBits = 32

  /** q43 — SimHash fingerprint + Hamming near-dup pairs via LOSSLESS
    * banding: the 32-bit fingerprint splits into 4 bands of 8 bits, and by
    * pigeonhole any pair within Hamming distance 3 agrees on at least one
    * whole band — so joining on (band, band_value) finds every qualifying
    * pair while pruning the quadratic cross product. Fingerprints fold
    * per-row (no shuffle); candidates scale with band-bucket sizes.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    // row-based fingerprint: one explode to (doc, token-hash), then all 32
    // per-bit sums in a single codegen'd aggregation (map-side partials) —
    // no per-element HOF lambdas in the hot path
    val th = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .select(col("doc_id"), charHash(col("word")).as("wh"))
    val bitSums = th.groupBy("doc_id").agg(
      sum(shiftright(col("wh"), 0).bitwiseAND(1L) * 2L - 1L).as("b0"),
      (1 until SimBits).map(j =>
        sum(shiftright(col("wh"), j).bitwiseAND(1L) * 2L - 1L).as(s"b$j")): _*)
    val sims = bitSums.select(col("doc_id"),
      (0 until SimBits).map(j =>
        when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
    val banded0 = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b.toLong).as("band"),
          shiftright(col("simhash"), b * 8).bitwiseAND(255L).as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bval"))
    val banded = banded0.persist() // both self-join sides read it
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** q44 — embedding-cosine near-duplicate pairs, blocked on the label
    * column (standard ER blocking: pair generation only within blocks, so
    * candidates scale with the largest block, not the corpus).
    */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") > 0.25)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
