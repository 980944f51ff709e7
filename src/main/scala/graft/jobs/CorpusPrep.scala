package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions
import graft.operators.DedupOps

/** The training-corpus preparation pipeline as one Spark application — the
  * text counterpart of BagIngest: raw documents in, a curated chunked lake
  * out, with a per-stage attrition report. Composes the library's curation
  * stages in their canonical order:
  *
  *   1. PII redaction (TextFunctions.redactPii — blur for text)
  *   2. quality gate (min tokens, max within-doc duplicate-3-gram rate)
  *   2b. LM perplexity filter (q90's CCNet-style kernel, opt-in): a
  *       bigram LM trained on the frontier's reference-source docs
  *       scores every frontier doc; the off-distribution tail above
  *       `lmMaxAvgNll` drops. Runs BEFORE dedup — scoring is linear,
  *       dedup is the expensive stage, so junk leaves first.
  *   2c. model-based quality filter (q95's kernel, opt-in): every
  *       frontier doc scored under the FROZEN trained classifier
  *       (ClfWeights — the train-offline/score-online deployment split);
  *       docs below `clfMinLogit` drop. Same placement rationale as 2b.
  *   3. exact dedup (content-hash canonical, cheapest first)
  *   4. near-dup group dedup (MinHash pairs -> connected components ->
  *      keep each group's canonical) — skippable for small/clean corpora
  *   4a. winnow near-dup catch (q50c, opt-in `--winnow-dedup[=THRESH]`):
  *       a surviving doc drops when it shares winnow-fingerprint Jaccard
  *       >= the threshold with a lower-id survivor (min-id rule, the
  *       SemDeDup convention). The position-local fingerprints catch
  *       partial-overlap near-dups — a doc that EMBEDS a copied block
  *       inside fresh text — which whole-doc MinHash signatures dilute
  *       below their band floor. Pairs form over the surviving
  *       frontier's posting-list-bounded fingerprint index, so the kept
  *       side of every pair is a survivor by construction.
  *   5. semantic dedup (SemDeDup, q67): drops docs whose EMBEDDING has an
  *      above-threshold cosine neighbor with a lower id — catches
  *      paraphrases that share no n-grams, which lexical dedup cannot.
  *      Opt-in (`Config.semantic`): needs the corpus's embedding table,
  *      keyed by the vec_id = doc_id convention.
  *   5a. D4 prototype pruning (q101, opt-in `--prototype-prune[=FRAC]`):
  *       drops the most-PROTOTYPICAL frac of each semantic cluster among
  *       the survivors (quantizer auto-k-trained on the frontier itself)
  *       — SemDeDup removes near-identical pairs, this removes redundant
  *       representative mass; together they are the D4 recipe
  *       (Tirumala et al. 2023). The drop list is frac·corpus sized:
  *       applied by a plain key anti-join, never broadcast.
  *   6. decontamination (q82's GPT-3/Pile rule): drops the held-out
  *      split itself AND every train doc one of whose 13-gram windows
  *      appears verbatim in it — a corpus that gates on quality and dedup
  *      but ships the benchmark (or its train-side echoes) poisons every
  *      downstream eval. Opt-in (`Config.decontaminate`); the removal
  *      list is q82's (hash-split heldout convention), applied by
  *      broadcast anti-join on doc_id.
  *   6a. fuzzy decontamination (q82b, opt-in): MinHash doc-level pass —
  *       a surviving train doc whose signature-estimated Jaccard against
  *       any held-out doc clears the cut drops (the paraphrase catch the
  *       verbatim window rule structurally misses); the held-out split
  *       itself leaves even when only this stage is on.
  *   6b. ExactSubstr span cut (q83b, Lee et al. 2021): duplicated token
  *       extents are CUT from the surviving docs' text (the canonical
  *       first occurrence keeps each span) — the span-level pass that
  *       removes boilerplate and partial copies doc-level dedup
  *       structurally cannot (those drop whole docs or nothing).
  *       Ownership is recomputed among the SURVIVORS, so the kept copy
  *       of every cut span ships by construction. Opt-in
  *       (`Config.spanCut`); a doc cut to nothing leaves the corpus.
  *   6c. ExactSubstr span MASK (q109) — the alternative policy to 6b:
  *       the same extents are substituted with the shared loss-mask
  *       sentinel instead of cut, keeping every doc length-stable (the
  *       trainer zeroes loss on sentinel positions; no doc leaves, no
  *       context splices). Opt-in (`Config.spanMask` / `--mask-spans`),
  *       mutually exclusive with 6b; provenance columns n_masked /
  *       mask_frac ride the written documents.
  *   7. sliding-window chunking (training-example shaping)
  *   8. opt-in q64b epoch repetition plan over the kept docs — the
  *      sqrt-temperature mixing table a training run consumes, computed
  *      on the CURATED corpus (`--epoch-plan`)
  *   9. opt-in training-shard export (`--train-shards`,
  *      jobs.TrainingShards): the curated corpus epoch-replicated,
  *      hash-line shuffled, token-budget packed and written as
  *      WebDataset tar shards — lake → training set, completed
  *
  * Usage: CorpusPrep <sf-dir> <out-dir> [--no-neardup] [--winnow-dedup[=THRESH]] [--semantic] [--prototype-prune[=FRAC]] [--decontaminate] [--fuzzy-decon[=MIN_EST]] [--span-cut | --mask-spans] [--lm-filter=MAX_AVG_NLL] [--clf-filter[=MIN_LOGIT]] [--epoch-plan] [--train-shards]
  *
  * Output layout:
  *   <out>/documents/  kept documents (redacted text, provenance columns)
  *   <out>/chunks/     window/stride chunks of the kept docs
  *   <out>/epoch_plan/ per-doc epoch repeats (only with --epoch-plan)
  *   <out>/train_shards/ packed WebDataset tar shards + manifest + stats
  *                     (only with --train-shards; see jobs.TrainingShards)
  *   <out>/stats/      one row per pipeline stage: rows in -> rows out
  *
  * Every stage is a deterministic DataFrame transform — the whole pipeline
  * is one lazy plan per output table, embarrassingly parallel, and safe to
  * re-run (overwrite semantics, no driver-side state beyond the q55
  * convergence counts).
  */
object CorpusPrep {

  final case class Config(
      minTokens: Long = 5,
      maxDupNgramRate: Double = 0.6,
      nearDup: Boolean = true,
      // q50c's winnow fingerprint pass (opt-in): position-local near-dup
      // catch over the surviving frontier — drops docs sharing winnow
      // Jaccard >= winnowThreshold with a lower-id survivor (partial
      // copies whole-doc MinHash dilutes below its band floor)
      winnowDedup: Boolean = false,
      winnowThreshold: Double = 0.35,
      semantic: Boolean = false,
      semanticThreshold: Double = 0.3,
      // None = MEASURE the dial (DedupOps.autoSemanticBitsOf over the
      // surviving frontier's embeddings — one cheap aggregation). The
      // previous fixed default of 0 was the unblocked q67 shape, measured
      // 129× wall for 10× data at sf10: a production job must never ship
      // the scale-killer configuration as its default. Some(n) pins an
      // explicit dial (0 = unblocked, for small/sparse corpora).
      semanticSubBlockBits: Option[Int] = None,
      // CCNet-style LM filter (q90 kernel): opt-in; drops frontier docs
      // whose avg bigram NLL under the reference-source LM exceeds the
      // threshold. The LM trains on the FRONTIER's reference docs (a doc
      // the quality gate dropped can't teach the LM). Threshold is
      // explicit by design: the right cut is corpus-specific (CCNet
      // buckets by perplexity terciles; a fixed default would silently
      // mean something different on every corpus).
      lmFilter: Boolean = false,
      lmRefSource: String = "src0",
      lmMaxAvgNll: Double = Double.PositiveInfinity,
      // Model-based quality filter (q95's kernel): opt-in; scores every
      // frontier doc under the FROZEN trained classifier (ClfWeights —
      // train offline, score online, the production deployment split)
      // and drops docs below the logit threshold. 0.0 is the calibrated
      // midpoint between the reference and background class means — a
      // meaningful default, unlike the LM stage's corpus-specific NLL.
      clfFilter: Boolean = false,
      clfMinLogit: Double = 0.0,
      // q101's D4 prototype-prune pass (opt-in): after semantic dedup
      // removed near-identical pairs, drop the most-PROTOTYPICAL
      // protoFrac of each semantic cluster (quantizer trained on the
      // surviving frontier — clusters describe survivors, not the raw
      // lake). SemDeDup + prototype pruning IS the D4 recipe.
      protoPrune: Boolean = false,
      protoFrac: Double = 0.25,
      decontaminate: Boolean = false,
      decontaminateNgram: Int = 13,
      // q82b's fuzzy MinHash decon pass (opt-in): drops surviving train
      // docs whose signature-estimated Jaccard against any held-out doc
      // clears the cut — the paraphrase catch the verbatim rule misses
      fuzzyDecon: Boolean = false,
      fuzzyDeconMinEst: Double = 0.5,
      spanCut: Boolean = false,
      spanCutNgram: Int = 8,
      // q109's mask policy over the SAME extents (mutually exclusive
      // with spanCut): substitute the loss-mask sentinel, keep lengths
      spanMask: Boolean = false,
      chunkWindow: Int = 32,
      chunkStride: Int = 24,
      // q64b's epoch repetition plan over the SURVIVING corpus: opt-in;
      // emits <out>/epoch_plan — per kept doc, how many times it ships
      // in one sqrt-temperature epoch (the mixing weights a training run
      // should use are the curated corpus's, not the raw crawl's)
      epochPlan: Boolean = false,
      // 9. opt-in TRAINING-SHARD export (jobs.TrainingShards): the
      // curated corpus epoch-replicated (the q64b plan — read from this
      // run's epoch_plan output, recomputed by the same kernel if the
      // plan stage was off), hash-line shuffled, token-budget packed and
      // written as WebDataset tar shards under <out>/train_shards — the
      // artifact a trainer's loader mounts, completing lake → training
      // set (the reference's Transfer-Learning → im2rec → RecordIO
      // hand-off, for text)
      trainShards: Boolean = false,
      trainShardsCfg: TrainingShards.Config = TrainingShards.Config(),
      // N > 1 materializes N training epochs in one run (epoch-e dirs,
      // per-epoch deterministic reshuffles — see TrainingShards --epochs)
      trainEpochs: Int = 1)

  def run(spark: SparkSession, sfDir: String, out: String,
      cfg: Config = Config()): Unit = {
    // a contradictory config fails in milliseconds AT ENTRY — stage 6's
    // position would run hours of dedup/decon cluster time first
    require(!(cfg.spanCut && cfg.spanMask),
      "span-cut and mask-spans are alternative policies over the same extents — choose one")
    val raw = Tables.documents(spark, sfDir)
    val total = raw.count()

    // 1. redact PII in place; keep the original length for provenance
    val redacted = raw.select(
      col("doc_id"), col("lang"), col("source"),
      TextFunctions.redactPii(col("text")).as("text"))

    // 2. quality gate: token floor + repetition ceiling (q57 semantics).
    // Persisted: this is the frontier every later stage (counts, dedup,
    // writes) reads — without it each of the job's actions would re-run
    // the redaction regex chain and shingle kernel over the whole corpus.
    val quality = qualityFrontier(redacted, cfg.minTokens, cfg.maxDupNgramRate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runStages(spark, sfDir, out, cfg, total, quality)
    finally quality.unpersist(blocking = false)
  }

  /** THE quality gate (q57 semantics: token floor + within-doc duplicate-
    * 3-gram-rate ceiling), as a frame transform — single-sourced so the
    * batch pipeline above and the streaming ingest guard
    * ([[CorpusPrepStream]]) apply the identical rule: a doc the batch
    * pipeline would ship cannot be one the stream guard rejects. Adds the
    * gate-time provenance columns (n_tokens, dup_rate, ...) and filters. */
  private[graft] def qualityFrontier(redacted: DataFrame, minTokens: Long,
      maxDupNgramRate: Double): DataFrame =
    redacted
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_ngrams", greatest(col("n_tokens") - 2, lit(0L)))
      .withColumn("n_distinct",
        size(call_function("graft_shingles", col("text"))).cast("long"))
      .withColumn("dup_rate",
        when(col("n_ngrams") > 0,
          (col("n_ngrams") - col("n_distinct")).cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0)))
      .filter(col("n_tokens") >= minTokens && col("dup_rate") <= maxDupNgramRate)

  private def runStages(spark: SparkSession, sfDir: String, out: String,
      cfg: Config, total: Long, qualityIn: DataFrame): Unit = {
    val nQuality = qualityIn.count()

    // 2b. LM perplexity filter (opt-in; q90's kernel over the frontier):
    // score every frontier doc under a bigram LM trained on the
    // frontier's reference-source docs and drop the off-distribution
    // tail. Frontier docs the scorer can't see (< 2 tokens — impossible
    // under the default minTokens, possible under a permissive config)
    // KEEP: absence of evidence is not a junk verdict. The drop list is
    // a doc_id column, applied by one anti-join.
    val lmKept = if (!cfg.lmFilter) qualityIn else {
      val drops = graft.operators.CurationOps
        .lmPerplexityOf(qualityIn.select("doc_id", "source", "text"), cfg.lmRefSource)
        .filter(col("avg_nll") > cfg.lmMaxAvgNll)
        .select("doc_id")
      qualityIn.join(drops, Seq("doc_id"), "left_anti")
    }
    val nLm = if (cfg.lmFilter) lmKept.count() else -1L

    // 2c. model-based quality filter (opt-in; q95's kernel over the
    // frontier under the FROZEN ClfWeights): docs whose calibrated logit
    // falls below the threshold drop. Frontier docs the scorer can't see
    // (zero non-empty tokens — impossible under the default minTokens)
    // KEEP: absence of evidence is not a junk verdict (the LM stage's
    // rule). The drop list is a doc_id column, one anti-join.
    val quality = if (!cfg.clfFilter) lmKept else {
      import graft.operators.{Clf, ClfWeights}
      val drops = Clf.scoreOf(
        lmKept.select("doc_id", "source", "text"),
        Clf.frozen, ClfWeights.Buckets)
        .filter(col("logit") < cfg.clfMinLogit)
        .select("doc_id")
      lmKept.join(drops, Seq("doc_id"), "left_anti")
    }
    val nClf = if (cfg.clfFilter) quality.count() else -1L

    // 3. exact dedup: keep the minimum doc_id per content hash
    val exactKeep = quality
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("text_hash").orderBy("doc_id")))
      .filter(col("rk") === 1)
      .drop("rk", "text_hash")
    val nExact = exactKeep.count()

    // 4. near-dup groups: canonical docs survive, the rest of each MinHash
    // connected component drops (q55's keep/drop list applied). NOTE: group
    // discovery runs on the RAW corpus ids — membership of kept ids is
    // intersected, so a group whose canonical fell to the quality gate
    // keeps its smallest surviving member instead of losing the group.
    val kept = if (!cfg.nearDup) exactKeep else {
      val groups = DedupOps.dedupGroups(spark, sfDir)
        .select(col("doc_id"), col("canonical"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("canonical").orderBy("doc_id")
      exactKeep.join(groups, Seq("doc_id"), "left")
        .withColumn("canonical", coalesce(col("canonical"), col("doc_id")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .drop("rk", "canonical")
    }
    val nKept = kept.count()

    // 4a. winnow near-dup catch (q50c): opt-in — a surviving doc drops
    // when it shares winnow-fingerprint Jaccard >= the threshold with a
    // LOWER-id survivor (min-id rule, the SemDeDup convention; doc_a <
    // doc_b is the pair-stream invariant, so dropping the b side keeps
    // the min). Pairs form over the SURVIVING frontier's fingerprint
    // index — posting-list bounded, never doc×doc — so the kept side of
    // every pair is a survivor by construction. The drop list is a
    // frac-of-corpus id column: plain anti-join, never broadcast.
    val winKept = if (!cfg.winnowDedup) kept else {
      val drops = graft.operators.CurationOps
        .winnowDedupOf(kept.select(col("doc_id"), col("text")),
          k = 5, w = 4, dfCap = 64, minShared = 2, cfg.winnowThreshold)
        .select(col("doc_b").as("doc_id")).distinct()
      kept.join(drops, Seq("doc_id"), "left_anti")
    }
    val nWinnow = if (cfg.winnowDedup) winKept.count() else -1L

    // 5. semantic dedup (SemDeDup): a doc whose embedding has an
    // above-threshold cosine neighbor with a LOWER id drops — the
    // paraphrase catch lexical dedup structurally cannot make. The
    // embedding frame is restricted to the SURVIVING doc ids first (same
    // intersection rule as the near-dup stage): pairs then form only among
    // survivors and the min-id representative is a survivor by
    // construction — a cluster whose canonical fell to an earlier gate
    // keeps its smallest surviving member instead of vanishing entirely.
    // Drop-list discovery is cluster-bounded under the frozen quantizer
    // (q67's shape); applying it is one anti-join on doc_id.
    var semanticBitsUsed = -1L // recorded in the stats table for auditability
    val semKept = if (!cfg.semantic) winKept else {
      val emb = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
        .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
        .join(winKept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      // the q67b/q67c density dial: identical embeddings share every sign
      // block, so exact semantic duplicates can never escape a block
      // boundary. By DEFAULT the dial is MEASURED from this frontier's
      // dominant-cluster population (autoSemanticBitsOf — one broadcast-
      // assign aggregation over the exact frame the quadratic stage is
      // about to pair up; q67c's design — the extra linear pass is the
      // price of keeping the quadratic stage from growing at all), so
      // per-cluster pair volume stays bounded at any corpus size with no
      // hand-tuned constant. An explicit Config value overrides for
      // pinned-dial runs (0 = unblocked, for small/sparse corpora).
      val bits = cfg.semanticSubBlockBits
        .getOrElse(DedupOps.autoSemanticBitsOf(spark, emb))
      semanticBitsUsed = bits.toLong
      val drops = DedupOps.semanticDedupOf(spark, emb, cfg.semanticThreshold, bits)
        .select(col("vec_id").as("doc_id"))
      winKept.join(drops, Seq("doc_id"), "left_anti")
    }

    // 5a. D4 prototype pruning (q101): opt-in — drop the most-
    // prototypical protoFrac of each semantic cluster among the
    // SURVIVORS (quantizer trained on this frontier, so clusters
    // describe what is actually shipping). The drop list is a frac-of-
    // corpus-sized id column: applied by a plain key anti-join, NEVER
    // broadcast (unlike the decon lists, it does not stay small).
    val (protoKept, nSemantic) =
      if (!cfg.protoPrune) (semKept, -1L)
      else {
        val emb = graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
          .join(semKept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        val drops = graft.operators.SimilarityOps
          .prototypePruneOf(spark, emb, cfg.protoFrac)
          .filter(!col("keep")).select(col("vec_id").as("doc_id"))
        (semKept.join(drops, Seq("doc_id"), "left_anti"), semKept.count())
      }

    // 6. decontamination: the held-out split ITSELF leaves the train
    // corpus (shipping the benchmark verbatim is the worst contamination
    // of all — removing only its train-side echoes while keeping the eval
    // docs would poison every downstream eval), and q82's removal list
    // (any 13-gram window shared verbatim with the held-out split flags
    // the TRAIN doc) is applied by broadcast anti-join — flag discovery
    // runs on the raw corpus (same raw-ids convention as group discovery
    // above), the heldout window index is broadcastable at any train
    // scale, and the list itself is a doc_id column small enough to
    // broadcast against the kept frontier.
    val (exactDeconKept, nPreDecon) =
      if (!cfg.decontaminate) (protoKept,
        // the pre-decon frontier count feeds the attrition report
        // whenever ANY decon stage runs after it
        if (cfg.fuzzyDecon) protoKept.count() else -1L)
      else {
        val drops = graft.operators.CurationOps
          .decontaminate(spark, sfDir, cfg.decontaminateNgram)
          .filter(col("drop")).select("doc_id")
        // the opt-in path pays one extra count of the pre-decon frontier
        // so the attrition report can show the decon stage's own attrition
        (protoKept.filter(!graft.operators.CurationOps.heldoutSplit)
          .join(broadcast(drops), Seq("doc_id"), "left_anti"), protoKept.count())
      }

    // 6a. FUZZY decontamination (q82b): opt-in MinHash doc-level pass —
    // a surviving train doc sharing an LSH band bucket with a held-out
    // doc at signature-estimated Jaccard >= the cut drops (catches
    // paraphrased benchmark leakage the verbatim window rule misses).
    // Same raw-ids flag discovery + broadcast anti-join pattern; when
    // the exact stage is off, the held-out split itself still leaves
    // (the fuzzy stage is still a DECONTAMINATION stage — shipping the
    // benchmark because only the fuzzy dial was chosen would be absurd).
    val (deconKept, nExactDecon) =
      if (!cfg.fuzzyDecon) (exactDeconKept, -1L)
      else {
        val drops = graft.operators.CurationOps
          .deconFuzzy(spark, sfDir, cfg.fuzzyDeconMinEst)
          .filter(col("drop")).select("doc_id")
        val base =
          if (cfg.decontaminate) exactDeconKept
          else exactDeconKept.filter(!graft.operators.CurationOps.heldoutSplit)
        (base.join(broadcast(drops), Seq("doc_id"), "left_anti"),
          if (cfg.decontaminate) exactDeconKept.count() else -1L)
      }

    // 6b. ExactSubstr span cut (q83b): opt-in text REWRITE of the
    // surviving frontier — duplicated extents cut, canonical ownership
    // recomputed among the survivors so the kept copy of every span
    // ships. The frontier lands as parquet FIRST (the span pass scans
    // its input three times — tokens, hash aggregate, probe-back — and
    // re-running the curation join DAG per scan would dwarf one extra
    // write); gate-time stats columns (n_tokens, dup_rate, ...) keep
    // describing the text AS GATED; a doc cut to nothing leaves the
    // corpus (its content survives in its canonical).
    val nDecon =
      if (!cfg.spanCut && !cfg.spanMask) {
        deconKept.write.mode(SaveMode.Overwrite).parquet(s"$out/documents")
        -1L
      } else {
        val staged = s"$out/_precut"
        deconKept.write.mode(SaveMode.Overwrite).parquet(staged)
        val precut = spark.read.parquet(staged)
        val n = precut.count()
        // 6b cut: inner join drops a doc cut to nothing (its text lives
        // in its canonical). 6c mask: every doc re-emits length-stable
        // with the provenance columns (q109's contract).
        val rewritten =
          if (cfg.spanCut)
            graft.operators.CurationOps.cutDupSpansOf(
              precut.select("doc_id", "text"), cfg.spanCutNgram)
          else
            graft.operators.CurationOps.maskDupSpansOf(
              precut.select("doc_id", "text"), cfg.spanCutNgram)
              .select(col("doc_id"), col("text"), col("n_masked"), col("mask_frac"))
        precut.drop("text")
          .join(rewritten, Seq("doc_id"))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/documents")
        val p = new org.apache.hadoop.fs.Path(staged)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        n
      }
    // count from the written parquet — a second execution of the curation
    // join DAG for a number the file footers already know would be waste
    val nFinal = spark.read.parquet(s"$out/documents").count()
    val nAfterDecon = if (cfg.spanCut || cfg.spanMask) nDecon else nFinal
    // audit row for the mask policy: total sentinel positions shipped
    // (the loss-mask budget a trainer will zero) — one column scan of
    // the just-written parquet, -1 = stage off
    val nMaskedTokens =
      if (!cfg.spanMask) -1L
      else spark.read.parquet(s"$out/documents")
        .agg(coalesce(sum(col("n_masked")), lit(0L))).head.getLong(0)

    // 7. chunk the kept docs for training-example shaping — the exact q60
    // chunker (shared implementation incl. its stride<=window guard), fed
    // from the just-written parquet so it never re-runs the curation DAG
    graft.operators.CurationOps
      .chunkDocsOf(spark.read.parquet(s"$out/documents"), cfg.chunkWindow, cfg.chunkStride)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/chunks")
    val nChunks = spark.read.parquet(s"$out/chunks").count()

    // 8. opt-in epoch repetition plan (q64b) over the kept docs — fed
    // from the written parquet like the chunker, one per-source window
    val nPlan =
      if (!cfg.epochPlan) {
        // remove a stale plan from a previous run of the same out dir:
        // the opt-in train-shard export below (and any later consumer)
        // must not silently honor a mix computed over a DIFFERENT
        // curation configuration's survivors
        val p = new org.apache.hadoop.fs.Path(s"$out/epoch_plan")
        val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (hfs.exists(p)) hfs.delete(p, true)
        -1L
      } else {
        graft.operators.CurationOps
          .epochMixOf(spark.read.parquet(s"$out/documents"))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/epoch_plan")
        spark.read.parquet(s"$out/epoch_plan").count()
      }

    // 9. opt-in training-shard export off the just-written curated lake
    // (documents + epoch_plan when present) — one job, its own attrition
    // row set under <out>/train_shards/stats
    val nShards =
      if (!cfg.trainShards) -1L
      else {
        TrainingShards.run(spark, out, s"$out/train_shards",
          cfg.trainShardsCfg, cfg.trainEpochs)
        // total packed sequences across every exported epoch (per-epoch
        // counts may differ by a shard-tail: packing follows each
        // epoch's own shuffle)
        val statsDirs =
          if (cfg.trainEpochs == 1) Seq(s"$out/train_shards/stats")
          else (0 until cfg.trainEpochs).map(e => s"$out/train_shards/epoch-$e/stats")
        statsDirs.map(p => spark.read.parquet(p)
          .filter(col("stage") === "04_sequences")
          .collect()(0).getLong(1)).sum
      }

    import spark.implicits._
    Seq(
      ("00_input", total),
      ("01_quality_gate", nQuality),
      // -1 = stage off (the convention the semantic rows use)
      ("01b_lm_filter", nLm),
      ("01c_clf_filter", nClf),
      ("02_exact_dedup", nExact),
      ("03_neardup_groups", nKept),
      ("03b_winnow_dedup", nWinnow),
      ("04_semantic_dedup",
        if (cfg.protoPrune) nSemantic
        else if (cfg.decontaminate || cfg.fuzzyDecon) nPreDecon
        else nAfterDecon),
      // the dial the semantic stage actually ran with (-1 = stage off):
      // the auditable record that a run measured its density instead of
      // silently pairing the unblocked shape
      ("04b_semantic_bits", semanticBitsUsed),
      ("04c_prototype_prune",
        if (!cfg.protoPrune) -1L
        else if (cfg.decontaminate || cfg.fuzzyDecon) nPreDecon
        else nAfterDecon),
      ("05_decontaminate",
        if (!cfg.fuzzyDecon) nAfterDecon
        else if (cfg.decontaminate) nExactDecon else -1L),
      ("05a_fuzzy_decon", if (cfg.fuzzyDecon) nAfterDecon else -1L),
      // policy-accurate span-stage ledger: each policy's doc count lands
      // under ITS OWN key (-1 = that policy off), so a mask-policy run's
      // stats can never misreport which rewrite ran
      ("05b_span_cut", if (cfg.spanCut) nFinal else -1L),
      ("05c_span_mask", if (cfg.spanMask) nFinal else -1L),
      ("05c_span_mask_tokens", nMaskedTokens),
      ("06_chunks", nChunks),
      ("07_epoch_plan", nPlan),
      ("08_train_sequences", nShards))
      .toDF("stage", "rows")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/stats")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusPrep <sf-dir> <out-dir> [--no-neardup] [--winnow-dedup[=THRESH]] [--semantic] " +
        "[--semantic-bits=N] [--prototype-prune[=FRAC]] [--decontaminate] " +
        "[--fuzzy-decon[=MIN_EST]] [--span-cut | --mask-spans] " +
        "[--lm-filter=MAX_AVG_NLL] [--clf-filter[=MIN_LOGIT]] [--epoch-plan] [--train-shards]")
    val spark = GraftSession.get()
    val lmMax = args.collectFirst {
      case a if a.startsWith("--lm-filter=") =>
        a.stripPrefix("--lm-filter=").toDouble
    }
    val fuzzyMin = args.collectFirst {
      case a if a.startsWith("--fuzzy-decon=") =>
        a.stripPrefix("--fuzzy-decon=").toDouble
      case "--fuzzy-decon" => 0.5
    }
    val clfMin = args.collectFirst {
      case a if a.startsWith("--clf-filter=") =>
        a.stripPrefix("--clf-filter=").toDouble
      case "--clf-filter" => 0.0
    }
    val winnowThresh = args.collectFirst {
      case a if a.startsWith("--winnow-dedup=") =>
        a.stripPrefix("--winnow-dedup=").toDouble
      case "--winnow-dedup" => 0.35
    }
    val protoFrac = args.collectFirst {
      case a if a.startsWith("--prototype-prune=") =>
        a.stripPrefix("--prototype-prune=").toDouble
      case "--prototype-prune" => 0.25
    }
    run(spark, args(0), args(1), Config(
      nearDup = !args.contains("--no-neardup"),
      winnowDedup = winnowThresh.isDefined,
      winnowThreshold = winnowThresh.getOrElse(0.35),
      semantic = args.contains("--semantic"),
      lmFilter = lmMax.isDefined,
      lmMaxAvgNll = lmMax.getOrElse(Double.PositiveInfinity),
      clfFilter = clfMin.isDefined,
      clfMinLogit = clfMin.getOrElse(0.0),
      // explicit dial pin; absent = measure it from the frontier (the
      // default a 100 TB run should take)
      semanticSubBlockBits = args.collectFirst {
        case a if a.startsWith("--semantic-bits=") =>
          a.stripPrefix("--semantic-bits=").toInt
      },
      protoPrune = protoFrac.isDefined,
      protoFrac = protoFrac.getOrElse(0.25),
      decontaminate = args.contains("--decontaminate"),
      fuzzyDecon = fuzzyMin.isDefined,
      fuzzyDeconMinEst = fuzzyMin.getOrElse(0.5),
      spanCut = args.contains("--span-cut"),
      spanMask = args.contains("--mask-spans"),
      epochPlan = args.contains("--epoch-plan"),
      trainShards = args.contains("--train-shards"),
      trainEpochs = args.collectFirst {
        case a if a.startsWith("--train-epochs=") =>
          a.stripPrefix("--train-epochs=").toInt
      }.getOrElse(1)))
    spark.stop()
  }
}
