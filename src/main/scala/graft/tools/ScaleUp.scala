package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale-evidence data generator: derive an sf×N lake from an existing sf
  * directory by replication with KEY REMAPPING, preserving the statistical
  * shape a real N× corpus would have (so per-query scaling ratios measure
  * the PLAN, not a degenerate dataset):
  *
  *  - Fact keys offset per replica by a power-of-ten base above the source
  *    max, applied consistently across referencing columns (orders.o_custkey
  *    moves with customer.c_custkey, lineitem's three FKs move with their
  *    tables) — join fan-outs and group counts scale ×N, per-key group
  *    sizes stay constant, exactly how TPC-H itself scales.
  *  - Dimension tables (region, nation) are fixed, as in TPC-H.
  *  - Document TEXT is re-tokenized per replica (every token suffixed with
  *    the replica tag): replicas share no shingles, so shingle df stays
  *    constant and dedup candidate-pair volume scales ×N — naive
  *    replication would instead make every doc a 10-way near-dup and blow
  *    pairs up ×N², which no real corpus does. n_chars is recomputed.
  *  - Embeddings are cyclically dimension-rotated AND sign-masked per
  *    replica (both transforms preserve norms and every within-replica dot
  *    product exactly; cross-replica cosine decorrelates even where
  *    rotations coincide or compose under stacked applications) so ANN
  *    bucket occupancy and semantic-dup structure scale ×N; vec_ids
  *    offset, so the `vec_id < 10` query sets stay 10 queries against an
  *    N× corpus — the realistic ANN scaling shape.
  *
  *  STACKING-SAFE (round 16): applying ScaleUp to its own output
  *  (sf0.1 → sf1 → sf10) must not re-correlate replicas — token tags
  *  chain (w~a~b) because replica 0 is tagged like every other, and the
  *  sign mask composes injectively where rotation alone collides.
  *
  * Usage: ScaleUp <src-sf-dir> <dst-dir> [factor=10]
  */
object ScaleUp {

  private def pow10Above(n: Long): Long = {
    var b = 1L
    while (b <= n) b *= 10
    b
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    // Fact outputs land as ~64 MB FILES with a cores-wide floor, matching
    // how a real N x corpus arrives (N x the files, never one blob). A
    // broadcast cross of a single-file source otherwise keeps ONE output
    // partition — the sf10 lake landed as one 1.2 GB parquet file, every
    // derived scan ran on ~2 maxPartitionBytes splits, and the decade
    // bench read 3x wall on FLAT CPU (q41c 18 -> 61 s with CPU 394 -> 397):
    // a skewed-LAYOUT artifact, not a plan property. Sizing by estimated
    // output bytes (src bytes x factor) rather than factor x splits keeps
    // the file count from exploding into the small-files problem at high
    // factors.
    def writeFact(df: DataFrame, t: String): Unit = {
      val srcPath = new org.apache.hadoop.fs.Path(s"$src/$t.parquet")
      val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val srcBytes = fs.getContentSummary(srcPath).getLength
      val target = 64L << 20
      val parts = math.max(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes * factor + target - 1) / target).min(4096L).toInt
      write(df.repartition(parts), t)
    }
    val reps = spark.range(factor).select(col("id").as("__r"))
    def replicate(df: DataFrame)(remap: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame = {
      val crossed = df.crossJoin(reps)
      remap(crossed, col("__r")).drop("__r")
    }
    def keyBase(df: DataFrame, key: String): Long = {
      // getAs[Number] (not getLong): an INT-typed key must widen, not
      // throw; and an empty table yields SQL NULL — fail with a message
      // naming the key instead of an opaque NPE
      val row = df.agg(max(col(key))).collect()(0)
      require(!row.isNullAt(0), s"ScaleUp: no rows under key '$key' — empty source table?")
      pow10Above(row.getAs[Number](0).longValue())
    }

    // dimension tables: fixed, copied verbatim
    write(read("region"), "region")
    write(read("nation"), "nation")

    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    val lineitem = read("lineitem")
    val bC = keyBase(customer, "c_custkey")
    val bS = keyBase(supplier, "s_suppkey")
    val bP = keyBase(part, "p_partkey")
    val bO = keyBase(orders, "o_orderkey")

    writeFact(replicate(customer)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + r * bC)), "customer")
    writeFact(replicate(supplier)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + r * bS)), "supplier")
    writeFact(replicate(part)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + r * bP)), "part")
    writeFact(replicate(orders)((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + r * bO)
        .withColumn("o_custkey", col("o_custkey") + r * bC)), "orders")
    writeFact(replicate(lineitem)((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + r * bO)
        .withColumn("l_partkey", col("l_partkey") + r * bP)
        .withColumn("l_suppkey", col("l_suppkey") + r * bS)), "lineitem")

    val events = read("events")
    val bEv = keyBase(events, "event_id")
    val bU = keyBase(events, "user_id")
    writeFact(replicate(events)((d, r) =>
      d.withColumn("event_id", col("event_id") + r * bEv)
        .withColumn("user_id", col("user_id") + r * bU)), "events")

    // ONE base for doc_id and vec_id: the corpus convention is
    // vec_id = doc_id, and independent bases would silently break it
    // whenever the two maxima straddle a power of ten
    val documents = read("documents")
    val embeddings = read("embeddings")
    val bD = math.max(keyBase(documents, "doc_id"), keyBase(embeddings, "vec_id"))
    // EVERY replica gets the tag — including replica 0. The first draft
    // kept r=0 verbatim "to preserve the original text", which made
    // STACKED applications (sf0.1 → sf1 → sf10) collide: a token w from
    // source replica a under second-pass replica b ends as w~a (b=0) or
    // w~b (a=0), so the (a=k, b=0) and (a=0, b=k) copies of every
    // original doc were TOKEN-IDENTICAL — phantom cross-replica
    // duplicates that read as superlinear dedup scaling (measured: q41c
    // output pairs 29.4× for 10× docs on a stacked sf10; exactly the
    // degenerate-dataset artifact this tool exists to avoid). Tagging
    // r=0 makes stacked tags CHAIN (w~a~b), unique per replica path.
    writeFact(replicate(documents)((d, r) =>
      d.withColumn("doc_id", col("doc_id") + r * bD)
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("~"), r.cast("string"))), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")

    // Embeddings: rotation + a replica-keyed SIGN-FLIP pattern. Rotation
    // alone has period dim/gcd — replicas r and r+64/5-cycles share the
    // rotation, and under stacking (a,b) vs (b,a) compose to the same
    // shift, re-correlating exactly like the token case. A per-replica
    // deterministic ±1 mask (xxhash64 of (replica, dimension) parity)
    // fixes both: s_i² = 1, so EVERY within-replica dot product — hence
    // all cosine/ANN geometry — is preserved bit-exactly, while any two
    // distinct replica paths disagree on ~half the signs and decorrelate.
    val dim = 64
    writeFact(replicate(embeddings)((d, r) => {
      val shift = ((r * 5) % dim).cast("int")
      val rotated = concat(
        slice(col("embedding"), shift + 1, lit(dim) - shift),
        slice(col("embedding"), lit(1), shift))
      // replica 0 is masked too (rotation there is the identity, the mask
      // is not): keeping r=0 verbatim would re-open the stacking
      // collision — pass-2 r=k over an untouched pass-1 r=0 equals
      // pass-1 r=k under an untouched pass-2 r=0
      val flipped = zip_with(rotated, sequence(lit(1), lit(dim)),
        (x, i) => when(pmod(xxhash64(r, i), lit(2)) === 0, x).otherwise(-x))
      d.withColumn("vec_id", col("vec_id") + r * bD)
        .withColumn("embedding", flipped)
    }), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <src-sf-dir> <dst-dir> [factor]")
    val factor = if (args.length >= 3) args(2).toInt else 10
    val spark = GraftSession.get()
    run(spark, args(0), args(1), factor)
    spark.stop()
  }
}
