package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.{cosine, norm, toDouble}

/** Text-analysis operators for corpus curation (SURVEY.md §2.C). All pure
  * per-row expressions (map-side, codegen'd) followed by at most one
  * aggregation — embarrassingly parallel at any scale.
  */
object TextAnalysisOps {

  /** Function-word profiles for the space-tokenized languages — a handful
    * of the highest-frequency function words per language (public
    * knowledge: these are the classic top-of-any-frequency-list words).
    * The en/es/de/fr sets are the original four and stay byte-identical
    * (q48's stop_ratio shares the en set; its oracle pins it).
    * private[graft]: SparkEntry generates the q47/q93 oracle SQL from
    * THESE constants, so the two sides cannot drift. */
  private[graft] val Stopsets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "it" -> Seq("il", "di", "che", "per", "non", "sono"),
    "pt" -> Seq("o", "do", "da", "em", "um", "uma"),
    "nl" -> Seq("het", "een", "van", "ik", "dat", "niet"),
    "sv" -> Seq("och", "att", "det", "som", "på", "av"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "jest"),
    "tr" -> Seq("bir", "ve", "bu", "için", "olarak", "çok"),
    "id" -> Seq("yang", "dan", "di", "ini", "untuk", "dengan"),
    "vi" -> Seq("và", "của", "là", "có", "không", "người"),
    "ro" -> Seq("și", "în", "la", "este", "cu", "pentru"),
    "fi" -> Seq("ja", "on", "ei", "että", "se", "hän"),
    "ru" -> Seq("и", "в", "не", "на", "что", "как"))

  /** Unicode script blocks for the non-space-tokenized / non-Latin-script
    * languages: (lang, BMP codepoint range). The score is the CHARACTER
    * count in the block (length minus length-with-block-removed — one
    * codegen'd regexp_replace, no array build), which is the decisive
    * signal where stopword tokenization cannot apply (zh/ja/th have no
    * spaces; ar/he/hi/el/ko are script-exclusive). Kanji is shared zh/ja:
    * kana (the ja block) is the discriminator, so mixed kanji+kana text
    * must out-count its kana over the zh block to flip — Japanese prose
    * is majority kana, Chinese prose has zero. All ranges are BMP, where
    * Spark (UTF-16 regex) and DuckDB (RE2 codepoints) count identically. */
  private[graft] val ScriptRanges: Seq[(String, Int, Int)] = Seq(
    ("zh", 0x4e00, 0x9fff), // CJK Unified Ideographs
    ("ja", 0x3040, 0x30ff), // Hiragana + Katakana
    ("ko", 0xac00, 0xd7af), // Hangul syllables
    ("ar", 0x0600, 0x06ff), // Arabic
    ("hi", 0x0900, 0x097f), // Devanagari
    ("el", 0x0370, 0x03ff), // Greek and Coptic
    ("he", 0x0590, 0x05ff), // Hebrew
    ("th", 0x0e00, 0x0e7f)) // Thai

  /** Verdict priority order: declaration order, stopword languages first
    * (ties between a stopword hit count and a script char count resolve
    * to the earlier language — deterministic, mirrored in the oracle). */
  private[graft] val AllLangs: Seq[String] =
    Stopsets.map(_._1) ++ ScriptRanges.map(_._1)

  /** q47 — language ID over ~23 languages: stopword-profile hit counts
    * for the space-tokenized languages + Unicode-script character counts
    * for the non-Latin scripts, argmax with a fixed priority order,
    * 'und' (unknown) still the first-class verdict when no evidence.
    */
  def langId(s: SparkSession, d: String): DataFrame =
    langIdOf(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(("doc_id" +: AllLangs.map(l => s"n_$l") :+ "lang_pred").map(col): _*)
      .orderBy("doc_id")

  /** [[langId]] as a frame transform (adds the n_* counts and
    * `lang_pred`, keeps the input columns) — the seam q93's fertility
    * breakdown classifies through, so its verdicts cannot drift from
    * q47's. */
  private[graft] def langIdOf(docs: DataFrame): DataFrame = {
    val withStops = Stopsets.foldLeft(docs) {
      case (df, (langName, words)) => df.withColumn(s"n_$langName", vocabCount(col("text"), words).cast("long"))
    }
    val base = ScriptRanges.foldLeft(withStops) {
      case (df, (langName, lo, hi)) =>
        val pattern = s"[${lo.toChar}-${hi.toChar}]"
        df.withColumn(s"n_$langName",
          (length(col("text")) - length(regexp_replace(col("text"), pattern, ""))).cast("long"))
    }
    val scores = AllLangs.map(l => col(s"n_$l"))
    val pred = AllLangs.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"n_$l") === greatest(scores: _*) && col(s"n_$l") > 0, lit(l)).otherwise(acc)
    }
    base.withColumn("lang_pred", pred)
  }

  /** q48 — document quality score: token count, type-token ratio, stopword
    * ratio, composite score. The curation filter every corpus pass runs.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame =
    qualityScoredOf(Tables.documents(s, d)).orderBy("doc_id")

  /** q48's kernel over an arbitrary (doc_id, text, ...) frame, carrying
    * `carry` columns through — the single source for the score formula
    * (q103's cluster map aggregates it per cluster; a formula change
    * reaches every consumer and its generated oracle together).
    * UNORDERED: driver queries order on top.
    */
  private[graft] def qualityScoredOf(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val ts = tokens(col("text"))
    docs
      .select(col("doc_id") +: carry.map(col) :+
        size(ts).cast("long").as("n_tokens") :+
        (size(array_distinct(ts)) / size(ts)).as("ttr") :+
        (vocabCount(col("text"), Stopsets.head._2) / size(ts)).as("stop_ratio"): _*)
      .withColumn("score", least(lit(1.0), col("n_tokens") / 100.0) * col("ttr"))
  }

  /** q48b — robust per-source length-outlier audit: median/MAD robust
    * z-scores (Iglewicz & Hoaglin's modified z, 0.6745·(x−med)/MAD) over
    * `n_chars`, reported as a per-source dashboard — doc counts at the
    * standard mild (|z|>2) and extreme (|z|>3.5) cuts plus the max z.
    * Mean/stddev outlier rules (q79's 3-sigma) break down on the
    * heavy-tailed length distributions real crawls have (the outliers
    * inflate the sigma that is supposed to catch them); median/MAD is
    * the standard robust replacement.
    *
    * Scale shape: two grouped exact percentiles (per-source value
    * multiset — at 100 TB swap in approx_percentile, the q14b device)
    * + one broadcast join of the catalog-bounded per-source stats frame
    * + one final per-source aggregation. No corpus sort, no window.
    */
  def lengthOutliers(s: SparkSession, d: String): DataFrame =
    lengthOutliersOf(
      Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")))

  /** [[lengthOutliers]] over an arbitrary (source, doc_id, n_chars) frame
    * — the seam the planted-outlier spec drives. */
  private[graft] def lengthOutliersOf(docs: DataFrame): DataFrame = {
    val med = docs.groupBy("source")
      .agg(percentile(col("n_chars"), lit(0.5)).as("med_chars"))
    // per-source stats are catalog-bounded (one row per source): broadcast
    val withMed = docs.join(broadcast(med), "source")
      .withColumn("ad", abs(col("n_chars") - col("med_chars")))
    val mad = withMed.groupBy("source")
      .agg(percentile(col("ad"), lit(0.5)).as("mad_chars"))
    withMed.join(broadcast(mad), "source")
      // MAD=0 (constant-length source): z undefined, contributes nothing
      .withColumn("z", when(col("mad_chars") > 0.0,
        lit(0.6745) * col("ad") / col("mad_chars")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("med_chars")).as("med_chars"),
        min(col("mad_chars")).as("mad_chars"),
        sum(when(col("z") > 2.0, 1L).otherwise(0L)).as("n_mild"),
        sum(when(col("z") > 3.5, 1L).otherwise(0L)).as("n_extreme"),
        max(col("z")).as("max_z"))
      .orderBy("source")
  }

  /** q110 — corpus QUALITY-DISTRIBUTION drift between eras: the
    * population stability index (PSI — the standard model-monitoring
    * drift statistic) of the q48 quality score, new arrivals vs the
    * trained-era reference. The text twin of q108's embedding-space
    * monitor: a crawl source going bad (spam wave, parser regression,
    * template flood) shifts the SCORE DISTRIBUTION long before any
    * single gate's attrition number moves, and PSI is the one-number
    * alarm with industry-standard thresholds (< 0.1 stable, 0.1–0.25
    * moderate shift, > 0.25 investigate).
    *
    * Method: era split at the id-watermark midpoint (q108's device; the
    * ingest watermark in production); bucket edges are the OLD era's
    * exact score deciles (Spark `percentile` ↔ DuckDB `quantile_cont`,
    * the q14 convention); both eras histogram against those FIXED edges
    * (a drifted new era redistributes across the reference's quantiles —
    * the definition of PSI); proportions are Laplace-smoothed
    * ((n+1)/(N+B)) so an empty bucket contributes a finite term instead
    * of an infinite log. PSI = Σ_b (p_new−p_old)·ln(p_new/p_old), each
    * term through the DECIMAL carrier (the q85 ln discipline), summed
    * exactly; one row per bucket (+ edges, counts, proportions, term)
    * and the bucket = −1 rollup whose `term` IS the PSI.
    *
    * Scale shape: ONE scored corpus pass (the shared q48 kernel — pure
    * map) → one exact-percentile aggregate over the old era (swap in
    * approx_percentile at 100 TB, the q14b device) → one bucket-count
    * aggregation; edges and totals are 1-row/10-row broadcasts. The
    * bucket frame is B rows — everything after the two corpus
    * aggregations is constant-size.
    */
  def qualityDrift(s: SparkSession, d: String, buckets: Int = 10): DataFrame = {
    val scored = qualityScoredOf(Tables.documents(s, d)).select(col("doc_id"), col("score"))
    val wm = scored.agg(
      floor((min(col("doc_id")) + max(col("doc_id"))) / lit(2L)).cast("long").as("wm"))
    // the scored kernel is consumed three times (watermark, old-era
    // percentile, bucket count) — persist the 16-byte-per-doc projection
    // so the map runs once; qualityDriftOf is eager (its output is a
    // local bounded frame), so the release after it returns is safe
    val persisted = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try qualityDriftOf(persisted, wm, buckets)
    finally persisted.unpersist(blocking = false)
  }

  /** The PSI core over an arbitrary scored frame `(doc_id, score)` and a
    * 1-row watermark frame `(wm)` — the q108 seam pattern: production
    * monitors pass their ingest watermark, the spec feeds crafted
    * identical/shifted eras. Two bounded-output corpus passes (old-era
    * percentile, then per-(bucket, era) counts — ≤ B rows, a legal
    * driver collect) and everything after is LOCAL constant-size
    * arithmetic: the first draft built the bucket table as a distributed
    * plan whose rollup/union branches re-executed the corpus subtrees —
    * measured 8× the CPU at sf10 for 11 output rows. */
  private[graft] def qualityDriftOf(scored: DataFrame, wm: DataFrame,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets; got $buckets")
    val tagged = scored.crossJoin(broadcast(wm))
      .withColumn("is_new", col("doc_id") >= col("wm"))
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    // pass 1: the OLD era's exact decile edges. A degenerate watermark
    // (every doc on the new side — possible on a 2-doc corpus whose
    // midpoint floors to the minimum) must fail DIAGNOSABLY, not NPE
    // inside the edge math
    val cutsRaw = tagged.filter(!col("is_new"))
      .agg(percentile(col("score"), typedLit(fracs)).as("cuts"))
      .head.getSeq[Double](0)
    require(cutsRaw != null,
      "PSI drift: the OLD era is empty — the watermark split is degenerate " +
        "(every doc landed on the new side); pass a watermark inside the id range")
    val cuts = cutsRaw
    // pass 2: per-(bucket, era) counts — bucket = 1 + |{edges <= score}|
    // (a score AT an edge goes up); ≤ `buckets` rows by construction
    val edge = typedLit(cuts)
    val counted = tagged
      .withColumn("bucket",
        (lit(1) + size(filter(edge, c => col("score") >= c))).cast("long"))
      .groupBy("bucket")
      .agg(
        count(when(!col("is_new"), 1)).as("n_old"),
        count(when(col("is_new"), 1)).as("n_new"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    psiFrame(scored.sparkSession, Some(cuts),
      (1 to buckets).map(b => counted.getOrElse(b.toLong, (0L, 0L))))
  }

  /** The LOCAL psi table builder shared by the batch query and the
    * streaming gauge: per-bucket smoothed proportions, carrier-quantized
    * terms (BigDecimal-on-Double.toString — the exact semantics of
    * Spark's double→DECIMAL(27,6) cast, proven in the q85 spec device),
    * rollup PSI as the exact decimal sum of the quantized terms. With
    * `edges` present the rows carry the lo/hi cutpoints (q110's shape);
    * without, the streaming gauge's 6-column shape.
    *
    * An EMPTY new era reads as NO READING, never as drift: with zero
    * arrivals the Laplace smoothing would fabricate a uniform p_new =
    * 1/buckets and PSI would measure the reference's own non-uniformity
    * against a fake distribution — a spurious alarm on a quiet batch —
    * so p_new/term/PSI are NULL instead (the q108 NULL-drift contract;
    * consumers treat a NULL rollup as "gauge had nothing to read"). */
  private def psiFrame(s: SparkSession, edges: Option[Seq[Double]],
      counts: Seq[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val buckets = counts.size
    val tOld = counts.map(_._1).sum
    val tNew = counts.map(_._2).sum
    def term(po: Double, pn: Double): Any =
      if (tNew == 0L) null
      else BigDecimal((pn - po) * math.log(pn / po))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val per = counts.zipWithIndex.map { case ((no, nn), i) =>
      val b = (i + 1).toLong
      val po = (no + 1).toDouble / (tOld + buckets)
      val pn = if (tNew == 0L) null
               else java.lang.Double.valueOf((nn + 1).toDouble / (tNew + buckets))
      val t = term(po, (nn + 1).toDouble / (tNew + buckets))
      edges match {
        case Some(e) =>
          val lo = if (b > 1) java.lang.Double.valueOf(e(i - 1)) else null
          val hi = if (b < buckets) java.lang.Double.valueOf(e(i)) else null
          Row(b, lo, hi, no, nn, po, pn, t)
        case None => Row(b, no, nn, po, pn, t)
      }
    }
    val psi: Any =
      if (tNew == 0L) null
      else per.map(r => BigDecimal(r.getDouble(r.length - 1))).sum.toDouble
    val rollup = edges match {
      case Some(_) => Row(-1L, null, null, tOld, tNew, null, null, psi)
      case None    => Row(-1L, tOld, tNew, null, null, psi)
    }
    val core = Seq(
      StructField("n_old", LongType, nullable = false),
      StructField("n_new", LongType, nullable = false),
      StructField("p_old", DoubleType, nullable = true),
      StructField("p_new", DoubleType, nullable = true),
      StructField("term", DoubleType, nullable = true))
    val schema = StructType(StructField("bucket", LongType, nullable = false) +:
      (if (edges.isDefined)
        Seq(StructField("lo", DoubleType, nullable = true),
          StructField("hi", DoubleType, nullable = true)) ++ core
      else core))
    // rows are constructed in output order (rollup −1, then buckets
    // ascending) — no orderBy: a range exchange over an 11-row local
    // relation is the kind of noise the plan pin forbids
    s.createDataFrame(java.util.Arrays.asList((rollup +: per): _*), schema)
  }

  /** Frozen drift REFERENCE for the streaming PSI gauge: the reference
    * corpus's decile edges and per-bucket counts, captured ONCE offline
    * (the train-offline/score-online split the streaming LM filter
    * uses). Bounded driver-side state: B−1 edges + B counts. */
  final case class DriftRef(edges: Seq[Double], counts: Seq[Long])

  /** Capture a [[DriftRef]] from a scored frame `(.., score)`. */
  private[graft] def driftReferenceOf(scored: DataFrame,
      buckets: Int = 10): DriftRef = {
    require(buckets >= 2, s"need >= 2 buckets; got $buckets")
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val cuts = scored.agg(percentile(col("score"), typedLit(fracs)).as("cuts"))
      .head.getSeq[Double](0)
    require(cuts != null,
      "drift reference: the scored frame is empty — no edges to capture")
    val edge = typedLit(cuts)
    val byBucket = scored
      .withColumn("bucket",
        (lit(1) + size(filter(edge, c => col("score") >= c))).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    DriftRef(cuts, (1 to buckets).map(b => byBucket.getOrElse(b.toLong, 0L)))
  }

  /** PSI of a scored frame against a FROZEN [[DriftRef]] — the streaming
    * gauge core (q110's arithmetic with the reference side captured
    * offline instead of recomputed; consistency spec-pinned: a ref
    * captured from the old era scored against the new era reproduces
    * q110's bucket rows and PSI exactly). Output: (bucket, n_old, n_new,
    * p_old, p_new, term) per bucket + the bucket = −1 rollup whose term
    * IS the PSI. */
  private[graft] def psiAgainst(scored: DataFrame, ref: DriftRef): DataFrame = {
    val buckets = ref.counts.size
    // ONE bounded-output corpus pass (≤ B rows); the table is local math
    val edge = typedLit(ref.edges)
    val got = scored
      .withColumn("bucket",
        (lit(1) + size(filter(edge, c => col("score") >= c))).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    psiFrame(scored.sparkSession, None,
      ref.counts.zipWithIndex.map { case (no, i) =>
        (no, got.getOrElse((i + 1).toLong, 0L))
      })
  }

  /** q49 — token statistics per language: whitespace tokens + regex word
    * tokens (the BPE-ish pre-tokenizer count).
    */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("lang"),
        size(tokens(col("text"))).cast("long").as("nt"),
        size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("nw"),
        col("n_chars"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        sum(col("nw")).as("sum_word_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("nt")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  /** q50 — rolling-hash document fingerprint (portable polynomial hash) —
    * the cheap stable content id used for incremental dedup across corpus
    * versions.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), charHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** q52 — characteristic terms per document: tf x (N/df) with a linear
    * inverse-document-frequency (no log, so the score is a ratio of exact
    * integers — engine-reproducible), top-3 per doc. Shape: one explode to
    * the token level, df by one groupBy, rank per doc — the inverted-index
    * pattern that scales linearly with corpus token count.
    */
  def topTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.select(count(lit(1)).as("n_total"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    // df has one row per distinct term (unbounded vocab at scale): no
    // broadcast hint; nDocs is a single row, safe to broadcast
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * col("n_total") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  /** q52b — Heaps-law vocabulary-growth curve: cumulative distinct-term
    * count as the corpus grows doc by doc, reported at `buckets` evenly
    * spaced doc_id cutoffs (Heaps 1978: V(n) ≈ K·n^β — the curve a
    * tokenizer/corpus-QA pass reads to decide whether vocabulary is
    * saturating or still growing, and the canary for boilerplate-heavy
    * crawls where it flattens early).
    *
    * Scale shape: the naive form rescans the corpus once per cutoff;
    * this one uses the first-occurrence trick — vocab at cutoff c is
    * |{terms with min(doc_id) ≤ c}| — so the whole curve costs ONE token
    * explode + ONE groupBy(term), then B-row arithmetic. The only
    * unbounded shuffle is the per-term min (vocabulary-sized, partial
    * aggregation applies); the cumulative window runs over B rows.
    */
  def vocabGrowth(s: SparkSession, d: String, buckets: Int = 10): DataFrame = {
    val docs = Tables.documents(s, d)
    // one-row horizon frame: bucket cutoffs derive from max(doc_id)+1
    val h = docs.select((max(col("doc_id")) + lit(1L)).as("horizon"))
    def bucketOf(c: Column): Column =
      least(lit(buckets.toLong), floor(c * buckets / col("horizon")) + lit(1L))
        .cast("long")

    val newTerms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(h))
      .groupBy(bucketOf(col("first_doc")).as("bucket"))
      .agg(count(lit(1)).as("new_terms"))

    val perBucket = docs
      .crossJoin(broadcast(h))
      .groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))

    // B rows total: the unpartitioned cumulative window is bounded by
    // construction (buckets, not corpus rows)
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTerms, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_docs", "n_tokens", "new_terms"))
      .select(
        col("bucket"),
        sum(col("n_docs")).over(w).as("n_docs_cum"),
        sum(col("n_tokens")).over(w).as("n_tokens_cum"),
        col("new_terms"),
        sum(col("new_terms")).over(w).as("vocab_size"))
      .orderBy("bucket")
  }

  /** q52c — Zipf rank-frequency fit (Zipf 1949; the companion law to
    * q52b's Heaps curve): the top-K terms by corpus frequency with their
    * log-log coordinates and the least-squares slope/intercept of
    * ln(freq) on ln(rank) — the Zipf exponent is THE one-number
    * distributional fingerprint of a corpus (natural language sits near
    * −1; boilerplate-heavy or templated crawls flatten the head and
    * steepen the tail, so drift across corpus versions is a QA signal).
    *
    * Scale shape: one token explode + one vocabulary-sized count (the
    * q52 df shape, partial-agg friendly), then TakeOrdered to the
    * K-bounded head — the window, the fit sums (DECIMAL carrier), and
    * the final join all run on ≤K rows. Deterministic: the (n DESC,
    * term) total order pins the boundary; ln/×/÷ are the q73-verified
    * IEEE chains.
    */
  def zipfFit(s: SparkSession, d: String, k: Int = 100): DataFrame = {
    require(k >= 2, s"zipf fit needs k >= 2 ranks; got $k")
    val tc = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    // bounded head: TakeOrdered (no global sort materialization); the
    // rank window then runs over <= k rows
    val top = tc.orderBy(col("n").desc, col("term")).limit(k)
    val w = Window.orderBy(col("n").desc, col("term"))
    // q85's ln discipline: JVM Math.log and DuckDB ln agree only to
    // within 1 ulp on arbitrary inputs — each log rides the carrier
    val l = top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("ln_rank", acc(log(col("rank").cast("double"))).cast("double"))
      .withColumn("ln_n", acc(log(col("n").cast("double"))).cast("double"))
    // fit sums as unpartitioned window aggregates over the <= K-row
    // frame: `l` is consumed ONCE (the q85b lesson — agg + crossJoin
    // duplicates the corpus-scale count/TakeOrdered subtree and relies
    // on ReuseExchange, which races at scale)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val denom = col("kk") * col("sxx") - col("sx") * col("sx")
    l
      .withColumn("kk", count(lit(1)).over(wAll).cast("double"))
      .withColumn("sx", sum(acc(col("ln_rank"))).over(wAll).cast("double"))
      .withColumn("sy", sum(acc(col("ln_n"))).over(wAll).cast("double"))
      .withColumn("sxy", sum(acc(col("ln_rank") * col("ln_n"))).over(wAll).cast("double"))
      .withColumn("sxx", sum(acc(col("ln_rank") * col("ln_rank"))).over(wAll).cast("double"))
      // a single-rank (or degenerate) head has no spread: NULL fit, not 0/0
      .withColumn("slope",
        when(denom =!= 0.0,
          (col("kk") * col("sxy") - col("sx") * col("sy")) / denom))
      .withColumn("intercept",
        when(denom =!= 0.0,
          (col("sy") - col("slope") * col("sx")) / col("kk")))
      .select("rank", "term", "n", "ln_rank", "ln_n", "slope", "intercept")
      .orderBy("rank")
  }

  /** q53 — token normalization: lowercase, strip non-alphanumerics, drop
    * stopwords and empties, dedupe — the canonical cleaning pass before any
    * dedup/index stage; emitted as per-doc stats so it is oracle-checkable.
    */
  def normalizeTokens(s: SparkSession, d: String): DataFrame = {
    val cleaned = array_distinct(filter(
      transform(tokens(lower(col("text"))), t => regexp_replace(t, "[^a-z0-9]", "")),
      t => t =!= "" && !t.isInCollection(Stopsets.head._2)))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_raw"),
        size(cleaned).cast("long").as("n_clean"),
        concat_ws(" ", array_sort(cleaned)).as("clean_sorted"))
      .orderBy("doc_id")
  }

  /** q51 — embedding-column statistics per label: exact-decimal mean norm
    * plus extrema; the sanity dashboard for an embedding pipeline.
    */
  def embedStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), norm(toDouble(col("embedding"))).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        davg(col("nrm")).as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("label")

  /** q87 — BPE merge-candidate statistics: corpus-wide counts of adjacent
    * character pairs within whitespace tokens, top-k by count — the
    * per-iteration signal a byte-pair-encoding tokenizer trainer
    * maximizes (Sennrich et al. 2016, arXiv:1508.07909: each merge step
    * promotes the most frequent adjacent symbol pair). One distributed
    * iteration of the inner loop, the piece that must see the WHOLE
    * corpus; the sequential merge loop around it is driver-side and
    * k-bounded by construction.
    *
    * Scale shape: token explode and the per-word pair transform are
    * map-side; the only shuffle is the pair-count aggregation, whose
    * group count is bounded by charset² regardless of corpus size (ideal
    * partial aggregation); top-k is TakeOrdered — no global sort.
    * Deterministic (count DESC, pair ASC) ranking so the boundary of the
    * top-k cut is engine-exact.
    */
  def bpePairs(s: SparkSession, d: String, k: Int = 50): DataFrame =
    Tables.documentsScaled(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** q66 — per-label mean embedding (class prototype/centroid vectors, long
    * format): the per-dimension averages go through the exact-decimal
    * carrier so the centroid is bit-identical under any partitioning —
    * the QA artifact for classifier-prototype drift and cluster sanity.
    *
    * Scale shape: posexplode is map-side; one shuffle on (label, dim) with
    * partial aggregation, final group count = labels × dims regardless of
    * corpus size. The wide-format centroid (one array row per label) is a
    * trivial collect_list over this output when a consumer wants it.
    */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("p", "x")))
      .groupBy(col("label"), (col("p") + 1).cast("long").as("dim_idx"))
      .agg(count(lit(1)).as("n_vectors"), davg(col("x")).as("mean_x"))
      .orderBy("label", "dim_idx")

  /** q66b — label-noise audit: embeddings ANTI-ALIGNED with their own
    * label's centroid (cosine < 0) — the vectors most likely mislabeled
    * or corrupt, surfaced before a classifier trains on them (the
    * centroid-distance noisy-label screen; q66's centroids put to work).
    *
    * Shape: the q66 (label, dim) exact-decimal mean collapses to one
    * centroid array per label, BROADCAST (|labels|×64 doubles — tiny at
    * any corpus scale); the cosine is then map-side per vector (one
    * corpus scan, zero windows, zero per-label sorts — an absolute
    * threshold needs no rank); label populations ride a second broadcast
    * of |labels| rows. Output is the flagged set only.
    *
    * Determinism: centroid means on the DECIMAL(27,6) carrier; dot/norm
    * through graft_dot's fixed ascending IEEE fold (the DOT64 oracle
    * chain); one multiply + one divide — bit-portable.
    */
  def labelOutliers(s: SparkSession, d: String): DataFrame = {
    val cent = Tables.embeddings(s, d)
      .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("p", "x")))
      .groupBy("label", "p")
      .agg(davg(col("x")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, e -> e.m)").as("cv"))
    val nlab = Tables.embeddings(s, d)
      .groupBy("label").agg(count(lit(1)).as("n_label"))
    Tables.embeddingsScaled(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .join(broadcast(cent), "label")
      .withColumn("csim", cosine(col("v"), col("cv"), norm(col("v")), norm(col("cv"))))
      .filter(col("csim") < 0.0)
      .join(broadcast(nlab), "label")
      .select("label", "vec_id", "csim", "n_label")
      .orderBy("label", "vec_id")
  }

  /** q66c — class-separation audit (the Fisher-criterion companion of
    * q66b's per-vector screen): per label, the mean/min cosine of its
    * OWN vectors to the label centroid (within-class cohesion) vs the
    * highest centroid-to-centroid cosine against any OTHER label
    * (nearest confusable class), and the margin between them — the
    * one-table answer to "which classes are clean, which pair will the
    * classifier confuse, and is the label space separable at all",
    * read BEFORE training (q94) instead of from its confusion matrix
    * after.
    *
    * Shape: q66's exact-decimal centroids collapse to |labels| arrays;
    * the self-cosine pass is ONE corpus scan with the centroids
    * broadcast (q66b's shape, aggregated per label instead of
    * filtered); the centroid×centroid frame is |labels|² rows — both
    * sides bounded, broadcast, windowed only over that tiny frame.
    * Cosines ride graft_dot's fixed IEEE fold; means ride the carrier.
    */
  def classSeparation(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    // persisted: the |labels|-row centroid frame is consumed three times
    // (self-cosine broadcast, both sides of the nearest pass) — uncached,
    // each branch re-runs the corpus-wide posexplode aggregate (the q85b
    // ReuseExchange-races-at-scale lesson); released by the caller's
    // clearCache (the shared-intermediate convention)
    val cent = emb
      .select(col("label"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("label", "p")
      .agg(davg(col("x")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, e -> e.m)").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val self = emb.join(broadcast(cent), "label")
      .withColumn("csim", cosine(col("v"), col("cv"), norm(col("v")), norm(col("cv"))))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        davg(col("csim")).as("mean_self_cos"),
        min(col("csim")).as("min_self_cos"))
    val other = cent.select(col("label").as("nearest_label"), col("cv").as("cv2"))
    // |labels|² rows: bounded frame, bounded window (ties -> smaller label)
    val w = Window.partitionBy("label")
      .orderBy(col("nearest_cos").desc, col("nearest_label"))
    val nearest = cent.crossJoin(broadcast(other))
      .filter(col("label") =!= col("nearest_label"))
      .withColumn("nearest_cos",
        cosine(col("cv"), col("cv2"), norm(col("cv")), norm(col("cv2"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("label", "nearest_label", "nearest_cos")
    self.join(nearest, "label")
      .withColumn("margin", col("mean_self_cos") - col("nearest_cos"))
      .select("label", "n_vectors", "mean_self_cos", "min_self_cos",
        "nearest_label", "nearest_cos", "margin")
      .orderBy("label")
  }

  /** q73 — BM25 keyword retrieval (Robertson/Okapi, k1=1.2 b=0.75): top-20
    * documents for a fixed query-term set, the lexical-search counterpart
    * of the ANN queries (q45/q46/q70) and the retrieval half of a hybrid
    * search stack.
    *
    * Shape: per-term tf is computed PER ROW from the token array (a handful
    * of query terms — no explode to the token level, unlike q52's full
    * inverted index), so the only shuffles are a 1-row corpus-stats
    * aggregate (N, avgdl, per-term df — broadcast back) and the final
    * top-k. Cost is one linear scan regardless of corpus size; for an
    * unbounded workload of ad-hoc queries the q52 inverted index is the
    * amortized path, but for one query vector of terms this is strictly
    * cheaper — no token-level shuffle at all.
    *
    * Determinism: tf/df/dl are exact integers; avgdl goes through the
    * exact-decimal carrier; the per-doc score is then a fixed chain of IEEE
    * double ops (JVM Math.log and DuckDB ln are bit-identical on these
    * inputs — verified at build time). Ties rank by doc_id.
    */
  def bm25(s: SparkSession, d: String,
           terms: Seq[String] = Seq("spark", "window", "merge"),
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    // documentsScaled: the per-doc tf kernel runs on the scan's splits —
    // a single-row-group lake file would run the whole corpus single-task
    // (measured CPU/wall 1.2 on 32 cores at sf10 before this)
    val docs = Tables.documentsScaled(s, d)
    def tf(t: String): Column = size(filter(tokens(col("text")), x => x === t)).cast("long")

    // persisted: stats AND scoring consume perDoc, and column pruning
    // rewrites the stats side's scan to text-only — without the persist
    // the corpus (and the 10-way tf kernel) is scanned twice, serially
    // on a single-row-group lake file
    val perDoc = docs.select(
      col("doc_id") +: size(tokens(col("text"))).cast("long").as("dl") +:
        terms.map(t => tf(t).as(s"tf_$t")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val aggs = count(lit(1)).as("n_docs") +: sum(acc(col("dl"))).cast("double").as("dl_sum") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(aggs.head, aggs.tail: _*)

    val score = terms.map { t =>
      val tfc = col(s"tf_$t").cast("double")
      val dfc = col(s"df_$t")
      val idf = log((col("n_docs").cast("double") - dfc + lit(0.5)) /
        (dfc.cast("double") + lit(0.5)) + lit(1.0))
      val denom = tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
      when(col(s"tf_$t") > 0, idf * (tfc * lit(k1 + 1.0)) / denom).otherwise(lit(0.0))
    }.reduce(_ + _)

    perDoc.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("dl_sum") / col("n_docs"))
      .withColumn("score", score)
      .filter(col("score") > 0.0)
      .select(col("doc_id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** The q73b benchmark query table: (query_id, terms). Shared with the
    * oracle-SQL generator in SparkEntry so the two sides cannot drift.
    * query 0 IS q73's fixed term set — restricting q73b to it must
    * reproduce q73's list exactly (spec-pinned). */
  val Bm25QuerySet: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "window", "merge"),
    1L -> Seq("join", "hash", "filter"),
    2L -> Seq("stream", "batch", "sort"))

  /** q73b — [[bm25]] fanned over a QUERY TABLE: per-query BM25 top-k, the
    * retrieval shape an eval harness actually runs (q81b fans the FUSION
    * over queries but shares one lexical list; here every query gets its
    * own list).
    *
    * Scale shape: the corpus is scanned ONCE for all queries — per-doc
    * tf columns for the UNION of query terms, one 1-row stats broadcast,
    * then each query's score is just a different arithmetic over the same
    * row (an explode of q 2-field structs, map-side; no join against a
    * query table, no per-query pass). Per-query top-k rides `graft_topk`
    * (bounded k-entry map-side heaps, shuffle carries k rows per
    * task×query) — NO Window node anywhere, nothing ever globally sorts,
    * and the plan is insensitive to both corpus size and query count
    * (within the driver-literal query-set convention; thousands of ad-hoc
    * queries want q52's inverted index instead).
    *
    * Determinism: per-term arithmetic is [[bm25]]'s fixed IEEE chain, but
    * each term's contribution passes through the exact-decimal carrier
    * (DECIMAL(27,6) — q85's ln discipline) before the sum: JVM Math.log
    * and DuckDB ln agree only to within 1 ulp on arbitrary inputs (q73's
    * three original terms happen to agree exactly; the wider term set
    * here does not), and the carrier makes that sub-resolution difference
    * vanish while decimal addition stays exact in any order. Ties rank by
    * doc_id via graft_topk's (score DESC, id ASC) total order.
    */
  def bm25PerQuery(s: SparkSession, d: String,
      queries: Seq[(Long, Seq[String])] = Bm25QuerySet,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queries.nonEmpty && queries.map(_._1).distinct.size == queries.size,
      "queries must be non-empty with distinct query ids")
    val allTerms = queries.flatMap(_._2).distinct
    val docs = Tables.documentsScaled(s, d) // the q73 few-split guard
    def tf(t: String): Column = size(filter(tokens(col("text")), x => x === t)).cast("long")

    // persisted for the same two-consumer reason as q73's perDoc: the
    // frame is all-long (no text), so the cache is ~100 bytes/doc
    val perDoc = docs.select(
      col("doc_id") +: size(tokens(col("text"))).cast("long").as("dl") +:
        allTerms.map(t => tf(t).as(s"tf_$t")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val aggs = count(lit(1)).as("n_docs") +: sum(acc(col("dl"))).cast("double").as("dl_sum") +:
      allTerms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(aggs.head, aggs.tail: _*)

    // one scoring expression per query over ITS term list — bm25's
    // per-term chain, each term through the exact-decimal carrier, summed
    // exactly, one final cast back to double
    def scoreOf(terms: Seq[String]): Column = terms.map { t =>
      val tfc = col(s"tf_$t").cast("double")
      val dfc = col(s"df_$t")
      val idf = log((col("n_docs").cast("double") - dfc + lit(0.5)) /
        (dfc.cast("double") + lit(0.5)) + lit(1.0))
      val denom = tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
      acc(when(col(s"tf_$t") > 0, idf * (tfc * lit(k1 + 1.0)) / denom).otherwise(lit(0.0)))
    }.reduce(_ + _).cast("double")

    val qScores = queries.map { case (qid, terms) =>
      struct(lit(qid).cast("long").as("query_id"), scoreOf(terms).as("score"))
    }
    perDoc.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("dl_sum") / col("n_docs"))
      .select(col("doc_id"), explode(array(qScores: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"), col("qs.score").as("score"))
      .filter(col("score") > 0.0)
      .groupBy("query_id")
      .agg(call_function("graft_topk",
        col("score"), col("doc_id"), col("doc_id"), lit(topK)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"), col("t.score").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Shannon entropy (bits) of a per-row symbol multiset, as one pure
    * array expression: p·ln p per DISTINCT symbol rides the exact-decimal
    * carrier (q85's ln discipline — JVM Math.log and DuckDB ln agree only
    * to 1 ulp, the carrier absorbs it), the fold is EXACT decimal
    * addition (order-free by construction — the oracle's SUM needs no
    * ORDER BY), and nats→bits is one IEEE division by the shared ln(2)
    * DOUBLE LITERAL (never a library log call that could differ in the
    * last bit between engines). Per-row cost is O(|alphabet|·len) array
    * scans — alphabet-bounded, fully codegen'd, zero shuffle. */
  private[graft] def entropyBits(arr: Column): Column = {
    val n = size(arr).cast("double")
    // symbol counts via RUN LENGTHS over the SORTED array — O(len·log len)
    // per row where the first draft's distinct×filter rescan was
    // O(types·len): a long high-vocabulary doc (exactly what a
    // high-entropy gauge exists to flag) made that quadratic, pinning an
    // executor core on one row. Boundary positions delimit runs; counts
    // are boundary gaps; the term MULTISET is identical to the per-type
    // formulation, and the decimal fold is order-free, so values are
    // bit-identical to the first draft (and the unchanged oracle).
    val sorted = array_sort(arr)
    val bnds = filter(sequence(lit(1), size(arr)), i =>
      (i === 1) || (element_at(sorted, i) =!= element_at(sorted, i - 1)))
    val nexts = concat(
      slice(bnds, lit(2), greatest(lit(0), size(bnds) - 1)), array(size(arr) + 1))
    val terms = zip_with(bnds, nexts, (a, b) => {
      val p = (b - a).cast("double") / n
      acc(p * log(p))
    })
    val nats = (-aggregate(terms, lit(java.math.BigDecimal.ZERO).cast("decimal(27,6)"),
      (a, x) => (a + x).cast("decimal(27,6)"))).cast("double")
    // an EMPTY symbol array (an empty document's char stream) reads 0
    // bits — the branch above would walk sequence(1, 0), which DESCENDS
    // in Spark (the coveredTokens lesson); CaseWhen evaluates lazily
    when(size(arr) === 0, lit(0.0)).otherwise(nats / lit(Ln2))
  }

  /** The double literal nearest ln 2 — shared with the generated oracle
    * SQL so both engines divide by the IDENTICAL constant. */
  private[graft] val Ln2 = 0.6931471805599453

  /** q106 — per-document entropy profile: Shannon entropy of the CHARACTER
    * and TOKEN distributions, the two classic cheap quality dials a
    * curation pipeline thresholds on (near-zero char entropy = padding /
    * single-symbol runs; abnormally HIGH char entropy = binary-ish or
    * encrypted junk; low token entropy at high length = boilerplate and
    * template spam — the repetition family's information-theoretic twin,
    * complementing q57/q65/q99's n-gram counters with a distributional
    * reading). Emits per doc: token count, distinct-type counts, and both
    * entropies in bits.
    *
    * Scale shape: a PURE MAP — every column is a per-row array expression
    * (no explode, no groupBy, no shuffle anywhere); cost per row is
    * O(types·len) with types bounded by the alphabet (chars) and the doc's
    * own vocabulary (tokens). At 100 TB this runs at scan speed next to
    * the other per-doc quality columns. Determinism: [[entropyBits]]'s
    * carrier discipline — each p·ln p quantized to 1e-6, decimal-exact
    * sum, one shared-literal division. Char-arm engine contract: Spark's
    * split iterates UTF-16 code units where the oracle's substr walks
    * codepoints — identical on BMP text (the ScriptRanges convention);
    * a supplementary-plane character (emoji) would count as two units
    * here and one there. An EMPTY document reads 0 bits on both sides
    * (the oracle LEFT-JOINs the char arm).
    */
  def entropyProfile(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    // drop the zero-width artifacts Java's regex split can emit so the
    // char multiset is exactly the text's characters (the oracle walks
    // substr positions, which never produce empties)
    val chars = filter(split(col("text"), ""), x => x =!= "")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_token_types"),
        entropyBits(toks).as("token_ent_bits"),
        size(array_distinct(chars)).cast("long").as("n_char_types"),
        entropyBits(chars).as("char_ent_bits"))
      .orderBy("doc_id")
  }
}
