package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.CurationOps

/** The curated corpus as a TRAINING ARTIFACT — the step between
  * CorpusPrep's lake and a trainer's data loader, and the text
  * counterpart of the reference's Transfer-Learning.ipynb → im2rec →
  * RecordIO hand-off (ground_truth_od.py's splits land as packed RecordIO
  * the notebook mounts; here the curated documents land as packed
  * WebDataset tar shards a text trainer streams).
  *
  * What it materializes, in order:
  *
  *  1. EPOCH REPLICATION (q64b): each curated doc ships `repeats` times
  *     per epoch under the √-temperature source mix — read from
  *     CorpusPrep's `epoch_plan` output when present, recomputed from the
  *     curated documents by the same kernel (CurationOps.epochMixOf)
  *     otherwise, so the export ALWAYS honors the curated corpus's mix.
  *  2. DETERMINISTIC SHUFFLE + SHARDING: every (doc, repeat) instance
  *     lands on the multiplicative-hash line h(doc_id, rep) — the
  *     q36/q58 determinism device — which simultaneously (a) assigns its
  *     shard (h mod shards), (b) orders it pseudo-randomly within the
  *     shard (the within-epoch shuffle a trainer wants, bit-stable under
  *     any partitioning), and (c) scatters a doc's repeats across
  *     different shards instead of back-to-back.
  *  3. TOKEN-BUDGET PACKING (q61/q61b semantics): per shard, the
  *     instance token stream is cut into fixed-`budget` sequences; a doc
  *     instance that straddles a boundary is SPLIT across the two
  *     sequences (fragments carry their offsets) — every emitted
  *     sequence holds exactly `budget` tokens except each shard's tail,
  *     so the "budget never exceeded" contract is structural.
  *  4. EXPORT: one WebDataset sample per packed sequence —
  *     `{shard}-{bin}.json` (provenance: the fragment list with doc_id,
  *     repeat, source, offset, token count) + `{shard}-{bin}.txt` (the
  *     sequence text) — written via [[TarShards.writeSharded]]: files
  *     named by LOGICAL shard, partition-parallel, size-rolled,
  *     byte-deterministic on re-export.
  *
  * Output layout:
  *   <out>/shards/    shard-SSSSS-NNN.tar  (WebDataset samples)
  *   <out>/manifest/  one row per packed sequence (shard, bin, counts)
  *   <out>/stats/     the export attrition row set (docs → instances →
  *                    sequences → shards)
  *
  * Scale shape: the epoch plan is one per-source window (q64b); the
  * instance explode is bounded by per-doc repeats (large sources repeat
  * {0,1}; a small source's repeat count is quota/size — the mixing
  * design, not a blowup); packing is one window per shard partition
  * (embarrassingly parallel across shards — q61's contract); sequence
  * assembly state is ≤ budget tokens per group; the tar writer streams
  * one sample at a time. Nothing is driver-sized except the stats row
  * set.
  *
  * Usage: TrainingShards <prep-out-dir> <export-out-dir>
  *          [--budget=512] [--shards=32] [--max-shard-mb=64]
  *          [--epoch-seed=0] [--epochs=1]
  * where <prep-out-dir> is a CorpusPrep output directory (documents/ and
  * optionally epoch_plan/). `--epoch-seed=e` materializes epoch e's
  * shuffle: a different deterministic permutation of the same instance
  * multiset per seed (trainers reshuffle between epochs). `--epochs=N`
  * materializes N epochs in one invocation as `epoch-0/ … epoch-(N-1)/`
  * directories (seeds epoch-seed+0 … epoch-seed+N-1), each with its own
  * shards/shardlist/manifest/stats. Every export also writes
  * `shardlist.txt` — the WebDataset loader-facing index (one relative
  * tar path per line, sorted), so a trainer never directory-lists.
  */
object TrainingShards {

  final case class Config(
      budget: Int = 512,
      shards: Int = 32,
      maxShardBytes: Long = 64L * 1024 * 1024,
      // Which epoch's shuffle to materialize: the seed folds into the
      // hash line, so each epoch gets a DIFFERENT deterministic
      // permutation of the same instance multiset (trainers reshuffle
      // between epochs; a run exports epoch e with epochSeed = e and
      // every worker regenerates identical bytes). 0 = the default
      // single-epoch export.
      epochSeed: Long = 0L)

  /** The multiplicative-hash line for (doc, repeat) instances: the same
    * constant family as q36/q58/q64b, with the repeat folded in so a
    * doc's copies scatter and the epoch seed folded in so each epoch
    * shuffles differently. Non-negative by construction. */
  private def instHash(epochSeed: Long) =
    (col("doc_id") * lit(2654435761L) + col("rep") * lit(1000003L) +
      lit(epochSeed) * lit(7919L)) % lit(1000000007L)

  /** Export `epochs` training epochs in ONE invocation: epoch e lands
    * under `<out>/epoch-e/` with the full per-epoch layout (shards/,
    * shardlist.txt, manifest/, stats/), its shuffle materialized via the
    * existing epochSeed device at seed = cfg.epochSeed + e — so the
    * N-epoch export is BYTE-IDENTICAL to N single-epoch exports at those
    * seeds (spec-pinned), and a trainer consumes epoch directories in
    * order with no coordination beyond the path. `epochs = 1` keeps the
    * historical single-epoch layout directly under `out`.
    */
  def run(spark: SparkSession, prepDir: String, out: String,
      cfg: Config = Config(), epochs: Int = 1): Unit = {
    require(cfg.budget >= 1 && cfg.shards >= 1, s"budget/shards must be >= 1")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val docs = spark.read.parquet(s"$prepDir/documents")
      .select(col("doc_id"), col("source"), col("text"))
    val fs = new org.apache.hadoop.fs.Path(s"$prepDir/epoch_plan")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val plan =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$prepDir/epoch_plan")))
        spark.read.parquet(s"$prepDir/epoch_plan")
      else CurationOps.epochMixOf(docs)
    if (epochs == 1)
      writeShards(spark, docs, plan.select("doc_id", "repeats"), out, cfg)
    else (0 until epochs).foreach { e =>
      writeShards(spark, docs, plan.select("doc_id", "repeats"),
        s"$out/epoch-$e", cfg.copy(epochSeed = cfg.epochSeed + e))
    }
  }

  /** The export over explicit (doc_id, source, text) + (doc_id, repeats)
    * frames — the seam the spec drives directly. */
  private[graft] def writeShards(spark: SparkSession, docs: DataFrame,
      plan: DataFrame, out: String, cfg: Config): Unit = {
    val budget = cfg.budget

    // 1-2. epoch instances on the hash line, sharded
    val inst = docs.join(plan, "doc_id")
      .filter(col("repeats") > 0)
      .select(col("doc_id"), col("source"), col("text"),
        explode(sequence(lit(1L), col("repeats"))).as("rep"))
      .withColumn("h", instHash(cfg.epochSeed))
      .withColumn("shard", (col("h") % cfg.shards).cast("int"))
      .withColumn("ts", split(col("text"), " "))
      .withColumn("n_tokens", size(col("ts")).cast("long"))

    // 3. per-shard running token sum in hash order (q61's one-window
    // shape), then each instance exploded into its per-sequence fragments
    val w = Window.partitionBy("shard").orderBy("h", "doc_id", "rep")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = inst
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start", col("cum") - col("n_tokens"))
    val frags = cum.select(
      col("shard"), col("doc_id"), col("rep"), col("source"), col("ts"),
      col("start"), col("cum"),
      explode(sequence(expr(s"start div $budget"), expr(s"(cum - 1) div $budget"))).as("bin"))
      .withColumn("fs", greatest(col("start"), col("bin") * budget))
      .withColumn("fe", least(col("cum"), (col("bin") + 1) * lit(budget.toLong)))
      .select(col("shard"), col("bin"), col("doc_id"), col("rep"), col("source"),
        (col("fs") - col("bin") * budget).as("offset"),
        (col("fe") - col("fs")).as("n_frag"),
        slice(col("ts"), (col("fs") - col("start") + 1).cast("int"),
          (col("fe") - col("fs")).cast("int")).as("frag"))

    // 4. one packed sequence per (shard, bin): fragments reassemble in
    // offset order; state per group <= budget tokens by construction
    val seqs = frags
      .groupBy("shard", "bin")
      .agg(sort_array(collect_list(struct(
        col("offset"), col("doc_id"), col("rep"), col("source"),
        col("n_frag"), col("frag")))).as("fr"))
      .select(col("shard"), col("bin"),
        size(col("fr")).cast("long").as("n_frags"),
        aggregate(col("fr"), lit(0L), (acc, x) => acc + x.getField("n_frag"))
          .as("n_tokens"),
        concat_ws(" ", flatten(col("fr.frag"))).as("seq_text"),
        to_json(struct(col("shard"), col("bin"),
          expr("transform(fr, x -> struct(x.doc_id, x.rep, x.source, x.offset, x.n_frag))")
            .as("docs"))).as("json"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // tar shards: repartition by logical shard, in-shard order by key
      // (zero-padded bin — lexicographic == numeric), writer rolls files
      val samples = seqs.select(col("shard"),
        format_string("%05d-%09d", col("shard"), col("bin")).as("key"),
        col("json"), lit("txt").as("ext"),
        col("seq_text").cast("binary").as("payload"))
        .repartition(cfg.shards, col("shard"))
        .sortWithinPartitions("shard", "key")
      TarShards.writeSharded(samples, s"$out/shards", cfg.maxShardBytes)
      writeShardlist(spark, out)

      // the loader-facing manifest: one row per sequence
      seqs.select("shard", "bin", "n_frags", "n_tokens")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/manifest")

      // attrition row set: corpus -> plan -> instances -> sequences
      val nDocs = docs.count()
      val planAgg = plan.agg(
        count(lit(1)).as("n"), sum(when(col("repeats") > 0, 1L).otherwise(0L)).as("pos"),
        sum(col("repeats")).as("inst")).collect()(0)
      val seqAgg = spark.read.parquet(s"$out/manifest").agg(
        count(lit(1)).as("n"), sum(col("n_tokens")).as("toks"),
        countDistinct(col("shard")).as("sh")).collect()(0)
      import spark.implicits._
      Seq(
        ("00_docs_in", nDocs),
        ("01_plan_rows", planAgg.getLong(0)),
        ("02_docs_shipped", planAgg.getLong(1)),
        ("03_epoch_instances", planAgg.getLong(2)),
        ("04_sequences", seqAgg.getLong(0)),
        ("05_tokens_packed", seqAgg.getLong(1)),
        ("06_shards", seqAgg.getLong(2)))
        .toDF("stage", "rows")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/stats")
    } finally seqs.unpersist(blocking = false)
  }

  /** WebDataset shardlist manifest: one relative tar path per line in
    * sorted (shard, roll) order — the loader-facing index, so a trainer
    * consumes the export from ONE small file instead of a directory
    * listing (object stores bill and throttle LIST; a 100 TB export is
    * thousands of tars). Driver-side single small file, bounded by the
    * shard count; deterministic because the names are logical. */
  private def writeShardlist(spark: SparkSession, out: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$out/shards")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".tar")).sorted
    val body = names.map(n => s"shards/$n").mkString("", "\n", "\n")
    val f = fs.create(new org.apache.hadoop.fs.Path(s"$out/shardlist.txt"), true)
    try f.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally f.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: TrainingShards <prep-out-dir> <export-out-dir> " +
        "[--budget=N] [--shards=N] [--max-shard-mb=N] [--epoch-seed=N] [--epochs=N]")
    def num(prefix: String, default: Long): Long = args.collectFirst {
      case a if a.startsWith(prefix) => a.stripPrefix(prefix).toLong
    }.getOrElse(default)
    val spark = GraftSession.get()
    run(spark, args(0), args(1), Config(
      budget = num("--budget=", 512).toInt,
      shards = num("--shards=", 32).toInt,
      maxShardBytes = num("--max-shard-mb=", 64) * 1024 * 1024,
      epochSeed = num("--epoch-seed=", 0)),
      epochs = num("--epochs=", 1).toInt)
    spark.stop()
  }
}
