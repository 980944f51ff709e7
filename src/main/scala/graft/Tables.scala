package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Typed loaders for the test-data lake (TESTDATA.md).
  *
  * Plain parquet scans so Catalyst gets full pushdown/pruning; at cluster
  * scale these would be partitioned/bucketed lake tables, and every operator
  * downstream is agnostic to that.
  */
object Tables {
  /** Key/count columns the engine reads with `getLong` driver-side and
    * joins across tables: widened to LONG at load when the lake ships a
    * narrower integral width (int32 ids would crash every collect site;
    * widening an already-long column is a no-op, which is today's case).
    * The same round-7 lesson as the `ts` convention: the lake's physical
    * widths are driver-controlled and can change between rounds; the
    * engine's conventions are enforced at the single load site.
    */
  private val LongCols: Map[String, Seq[String]] = Map(
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id", "n_chars"),
    "embeddings" -> Seq("vec_id"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "customer"   -> Seq("c_custkey", "c_nationkey"),
    "supplier"   -> Seq("s_suppkey", "s_nationkey"),
    "part"       -> Seq("p_partkey", "p_size"),
    "nation"     -> Seq("n_nationkey", "n_regionkey"),
    "region"     -> Seq("r_regionkey"))

  private def widenIds(df: DataFrame, name: String): DataFrame =
    LongCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema.find(_.name == c).map(_.dataType) match {
        case Some(ByteType) | Some(ShortType) | Some(IntegerType) =>
          d.withColumn(c, col(c).cast(LongType))
        case _ => d
      }
    }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    widenIds(spark.read.parquet(s"$dir/$name.parquet"), name)

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = normalizeTs(t(s, d, "events"))

  /** Loader by table name — GraftSql's views route through this so SQL
    * sees the same normalized conventions as the DataFrame surface. */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else t(s, d, name)

  /** Engine-wide `ts` convention: epoch-nanoseconds as LONG.
    *
    * The lake's physical type for `events.ts` is not under our control and
    * has shipped both as parquet TIMESTAMP(NANOS) (read as an epoch-nanos
    * long via `spark.sql.legacy.parquet.nanosAsLong`) and as timestamp[us]
    * (read as TIMESTAMP / TIMESTAMP_NTZ). Every operator downstream does
    * integer arithmetic on `ts`, so normalize at the single load site:
    * timestamp-typed columns become `unix_micros * 1000` (exact int64 —
    * µs-precision data has nanos ≡ 0, and the DuckDB oracles use
    * `epoch_ns()` which agrees bit-for-bit), long-typed columns pass
    * through. Schema-adaptive, so a lake rewrite can never change query
    * semantics again.
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema.find(_.name == name).map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        // NTZ first casts to TIMESTAMP: session TZ is pinned to UTC
        // (GraftSession), so the wall-clock instant is preserved exactly.
        df.withColumn(name, unix_micros(col(name).cast(TimestampType)) * lit(1000L))
      case Some(LongType) | None => df
      case Some(other) =>
        throw new IllegalArgumentException(
          s"events.$name has unsupported physical type $other; expected timestamp or long")
    }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `documents`, spread across the cluster when the input has fewer splits
    * than cores: per-row kernel queries (shingles, langid, fingerprints)
    * otherwise run single-threaded on a lone scan partition of a
    * small/single-file input. A many-split corpus (the 100 TB case) already
    * parallelizes and no shuffle is added.
    */
  def documentsScaled(s: SparkSession, d: String): DataFrame =
    spreadScan(s, documents(s, d))

  /** `embeddings` under the same few-split guard: the embedding-dedup
    * family verifies millions of candidate pairs with per-row cosines
    * downstream of the scan, and a single-file input would run that work
    * on one or two cores (measured at sf10: CPU/wall 1.26 on 32 cores —
    * the blocked self-join's verify stage inherited the scan's 1-split
    * parallelism). A many-split corpus (the 100 TB case) already
    * parallelizes and no shuffle is added.
    */
  def embeddingsScaled(s: SparkSession, d: String): DataFrame =
    spreadScan(s, embeddings(s, d))

  /** The few-split guard itself (private[graft]): operators apply it to
    * exactly the CORPUS side of a query — never to a pushed-filter query
    * side, where the repartition would shuffle the whole table to keep a
    * handful of rows. */
  private[graft] def spreadScan(s: SparkSession, df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
      df.repartition(s.sparkContext.defaultParallelism) else df

  /** q36's deterministic multiplicative-hash sample line as a reusable
    * predicate: keep a row iff h(id) lands under frac (ppm-exact integer
    * threshold — never rand(), stable under any partitioning/cluster
    * size, and the SAME ids are kept by every operator that samples at
    * the same frac, so cross-operator joins over a shared sample stay
    * aligned). frac = 1.0 keeps everything (a literal TRUE the optimizer
    * erases). The operating-curve queries (q96/q97/q68c) take this as
    * their documented `sampleFrac` dial: a 100 TB operator derives the
    * dial tables from a corpus sample at 1/frac of the cost.
    */
  private[graft] def sampleLine(id: org.apache.spark.sql.Column, frac: Double): org.apache.spark.sql.Column = {
    require(frac > 0.0 && frac <= 1.0, s"sampleFrac in (0, 1]; got $frac")
    if (frac >= 1.0) org.apache.spark.sql.functions.lit(true)
    else org.apache.spark.sql.functions.pmod(
      id * org.apache.spark.sql.functions.lit(2654435761L),
      org.apache.spark.sql.functions.lit(1000000L)) <
      org.apache.spark.sql.functions.lit(math.round(frac * 1e6))
  }
}
