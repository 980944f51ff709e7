package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Distributed byte-pair-encoding tokenizer trainer (Sennrich et al. 2016,
  * arXiv:1508.07909) — the k-round loop around q87's one-iteration pair
  * statistics. Each round: count adjacent SYMBOL pairs corpus-wide
  * (bounded aggregation — group count ≤ live-vocabulary², in practice a
  * few thousand), promote the most frequent pair to the merge table
  * (driver-side, deterministic (count DESC, left ASC, right ASC)
  * tie-break), and rewrite the token stream with that pair fused —
  * exactly the reference algorithm, with the corpus-wide count as the
  * distributed stage and the k-bounded merge table as driver state (the
  * Kmeans/dedupGroups iteration pattern).
  *
  * Scale shape per round: the merge application is one map-side
  * `aggregate` fold per word (left-to-right non-overlapping, the
  * reference semantics — a just-fused symbol never re-fuses as the LEFT
  * of the same pair in the same round); the pair count is one shuffle
  * with ideal partial aggregation; the working set persists between
  * rounds and unpersists its parent (bounded lineage, bounded cache —
  * ONE corpus pass to build the distinct-word multiset, then k
  * vocabulary-sized rounds, which IS the reference trainer's cost
  * shape). Driver state is the k-row merge table, never corpus-sized.
  */
object Bpe {

  /** One trained merge: rank r means "the r-th most valuable fusion". */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** The left-to-right non-overlapping fusion of (l, r) over a symbol
    * array, as one codegen'd fold: walking symbols left to right, fuse
    * when the accumulator's LAST symbol is `l` and the next is `r` — the
    * fused symbol `lr` can then only match as a whole, so "aaa" under
    * (a,a) becomes [aa, a], never [a, aa] or [aaa] (the reference
    * implementation's exact greedy semantics). Built with Column
    * lambdas + lit(), NOT an expr() SQL string: symbols come from the
    * corpus, and a symbol containing a quote or backslash would be
    * mis-parsed by the SQL literal path (silently diverging from the
    * lit()-based replace-chain encoder). */
  private[graft] def applyMerge(l: String, r: String): Column =
    aggregate(col("w"),
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The corpus as its DISTINCT-word multiset: one row per distinct
    * word with its corpus frequency. This is the reference trainer's own
    * representation (Sennrich's implementation trains on a {word: freq}
    * dict), and it is THE scale design for the loop: after this one
    * corpus pass, every round's work is O(distinct vocabulary) —
    * sub-linear in the corpus by Heaps' law — instead of re-folding
    * every word instance k times. Pair counts are freq-weighted sums —
    * the same exact integers, so the trained sequence is unchanged.
    *
    * Words travel in the q89 encoder's bracket-delimited symbol-STRING
    * form (SO+sym+SC per symbol), so each round's merge application is
    * ONE codegen'd literal `replace` — the first trainer's interpreted
    * per-element array fold ([[applyMerge]], kept as the spec-verified
    * reference semantics) cost 65 CPU-s per round at sf1 for identical
    * output (fold == replace-chain is spec-pinned merge by merge). The
    * encoder's delimiter caveat now covers the trainer too: a token
    * CONTAINING the delimiter control chars would mis-bracket (real
    * tokenizer pipelines strip control chars upstream). */
  private[graft] def initialWords(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) >= 1)
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .select(concat(lit(SO),
        array_join(split(col("t"), ""), SC + SO), lit(SC)).as("w"),
        col("freq"))

  /** UTF8-binary "less than" — java.lang.String compares UTF-16 code
    * UNITS, which disagrees with Spark's UTF8String binary ordering on
    * supplementary characters (surrogate pairs sort below U+E000..U+FFFF
    * in UTF-16, above in code-point/UTF-8 order). The trainer's tie-break
    * must reproduce the replaced `orderBy(l, r)` exactly for ANY corpus
    * symbol, so the driver-side argmax compares UTF-8 bytes unsigned. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The most frequent adjacent pair of the current symbol stream, with
    * its count — q87's aggregation generalized to multi-char symbols,
    * as ONE kernel job over the persisted word multiset: a per-partition
    * HashMap of pair→freq-weighted count (bounded by live-vocabulary²,
    * in practice a few thousand entries) merged pairwise, then the
    * (n DESC, l ASC, r ASC) argmax driver-side under UTF-8 binary string
    * order ([[utf8Lt]]) — the exact total order the replaced Catalyst
    * `orderBy(desc(n), l, r).limit(1)` applied. Counts are exact integer
    * sums either way, so the selected merge is identical. */
  private def bestPair(words: org.apache.spark.rdd.RDD[(String, Long)])
      : Option[(String, String, Long)] = {
    val counts = words.treeAggregate(
      collection.mutable.HashMap.empty[(String, String), Long])(
      (m, wf) => {
        val (w, f) = wf
        // w = SO+sym+SC per symbol: strip the outer brackets, split on
        // the SC+SO seam (only ever a symbol boundary by construction)
        val syms = BOUNDARY.split(w.substring(1, w.length - 1), -1)
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          m.update(key, m.getOrElse(key, 0L) + f)
          i += 1
        }
        m
      },
      (a, b) => {
        val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
        small.foreach { case (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
        big
      })
    if (counts.isEmpty) None
    else {
      val ((l, r), n) = counts.minBy(identity)(Ordering.fromLessThan[((String, String), Long)] {
        case (((l1, r1), n1), ((l2, r2), n2)) =>
          if (n1 != n2) n1 > n2
          else if (l1 != l2) utf8Lt(l1, l2)
          else utf8Lt(r1, r2)
      })
      Some((l, r, n))
    }
  }

  /** The SC+SO symbol seam, precompiled as a LITERAL pattern (compiled
    * once per executor, not once per word). LAZY: object vals initialize
    * in declaration order and SO/SC are declared below — an eager val
    * here compiled Pattern("nullnull") and silently split nothing. */
  private lazy val BOUNDARY = java.util.regex.Pattern
    .compile(SC + SO, java.util.regex.Pattern.LITERAL)

  /** Train `rounds` merges over the documents' whitespace tokens. Stops
    * early when the best remaining pair's count falls below `minCount`
    * (nothing left worth fusing). Deterministic: counts are exact
    * integers and the (n DESC, left ASC, right ASC) argmax is a total
    * order, so the merge SEQUENCE is engine- and partitioning-exact. */
  def train(s: SparkSession, docs: DataFrame, rounds: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(rounds >= 1 && rounds <= 4096, s"rounds in [1,4096]; got $rounds")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // Round 17 (guide §1.2 / §7.3, the Clf-kernel lesson): the loop runs
    // over a raw persisted (word, freq) RDD — ONE treeAggregate job per
    // round — instead of per-round Catalyst queries. The replaced shape
    // paid, per round, a fresh bestPair plan + a snapshot count job whose
    // plan embedded the round's merge as literals (no codegen cache hit),
    // ~2 jobs and a full plan/codegen cycle per round — driver latency a
    // cluster pays exactly as local mode does. The update rule is
    // IDENTICAL: pair counts are exact freq-weighted integer sums, the
    // argmax total order is (n DESC, l ASC, r ASC) under UTF-8 binary
    // string order (bestPair's scaladoc), and the merge application is
    // java.lang.String.replace — literal, left-to-right, non-overlapping,
    // the same semantics as the replaced Catalyst `replace` (and DuckDB's;
    // the q89 equivalence). LlmOpsSpec pins the merge sequence against a
    // reference implementation; the frozen BpeMerges oracle pins q88.
    var prev: org.apache.spark.rdd.RDD[(String, Long)] = null
    var words = initialWords(docs).rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = try words.count() catch {
      case e: Throwable => words.unpersist(blocking = false); throw e
    }
    // right-size the loop's parallelism to PER-ROUND KERNEL WORK (the
    // Clf.train dial lesson): each round costs ~0.5 µs of pair-count +
    // replace CPU per distinct word, so ~20k words/partition keeps round
    // stages at tens of ms while the corpus scan's inherited width would
    // pay 32 near-empty tasks per round at small SF. At 100 TB the
    // distinct vocabulary (Heaps' law) still spreads to cluster width.
    val k = math.min(s.sparkContext.defaultParallelism.toLong,
      vocab / 20000L + 1L).toInt
    if (k < words.getNumPartitions) {
      val sized = words.coalesce(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try sized.count() catch {
        case e: Throwable =>
          sized.unpersist(blocking = false)
          words.unpersist(blocking = false)
          throw e
      }
      words.unpersist(blocking = false)
      words = sized
    }
    try {
      var round = 1
      var continue = true
      while (continue && round <= rounds) {
        // the aggregate materializes this round's words into its persist
        // (reading the PREVIOUS round's cached blocks), so a round is one
        // job; the grandparent snapshot releases right after
        val best = bestPair(words)
        if (prev != null) { prev.unpersist(blocking = false); prev = null }
        best match {
          case Some((l, r, n)) if n >= minCount =>
            merges += Merge(round, l, r, n)
            val (pat, rep) = (SO + l + SC + SO + r + SC, SO + l + r + SC)
            val next = words.map { case (w, f) => (w.replace(pat, rep), f) }
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            prev = words
            words = next
            round += 1
          case _ => continue = false
        }
      }
    } finally {
      words.unpersist(blocking = false)
      if (prev != null) prev.unpersist(blocking = false)
    }
    merges.toSeq
  }

  /** q88 — the trained merge table as a driver query: runs the FULL
    * k-round trainer on the given lake and emits (rank, left, right, n).
    * Oracled by the frozen [[BpeMerges]] VALUES table (the PqCodebooks
    * pattern: the constants were trained by jobs.BpeTrain on the
    * correctness-gate lake with this exact code, so parity pins the
    * whole distributed loop — counts, tie-breaks, and merge application —
    * engine-exactly; retraining = rerun jobs.BpeTrain, refresh the file).
    */
  def bpeTrainTable(s: SparkSession, d: String,
      rounds: Int = BpeMerges.Rounds): DataFrame = {
    import s.implicits._
    // documentsScaled, not documents: every trainer round inherits the
    // scan's partitioning (the fold output keeps its parent's splits),
    // so a few-split input would run all k corpus passes on a handful
    // of cores — measured 3-way-parallel on 32 cores at sf10 before
    // this. Counts and argmax are partitioning-independent, so the
    // trained sequence (and the frozen-artifact parity) is unchanged.
    train(s, Tables.documentsScaled(s, d), rounds)
      .map(m => (m.rank.toLong, m.left, m.right, m.n))
      .toDF("rank", "left", "right", "n")
  }

  // Symbol-boundary delimiters for the replace-chain encoder: each symbol
  // travels as SO+sym+SC, so a literal string replace of SO+l+SC+SO+r+SC
  // can only ever consume two WHOLE adjacent symbols (the brackets make a
  // partial-symbol match impossible), and because the match shares no
  // characters with its neighbors, java.lang.String/DuckDB left-to-right
  // non-overlapping replace IS the trainer's greedy fold ("aaaa" under
  // (a,a) -> [aa][aa], "aaa" -> [aa][a]). A token CONTAINING the
  // delimiter chars would mis-bracket — both engines apply the identical
  // transform so oracle parity still holds, but the decode invariant
  // wouldn't; real tokenizer pipelines strip control chars upstream
  // (the quality gate's redaction stage is the natural place).
  private[graft] val SO = "\u0001"
  private[graft] val SC = "\u0002"

  /** The replace-chain encode of token column `w`, still in wrapped form. */
  private def encodeCol(merges: Seq[(Int, String, String, Long)]): Column = {
    val wrapped = concat(lit(SO),
      array_join(split(col("w"), ""), SC + SO), lit(SC))
    merges.sortBy(_._1).foldLeft(wrapped) {
      case (c, (_, l, r, _)) =>
        replace(c, lit(SO + l + SC + SO + r + SC), lit(SO + l + r + SC))
    }
  }

  /** The corpus token stream ENCODED with a frozen merge table, applied in
    * rank order — the inference half of the tokenizer (train = q88,
    * encode = this). One chain of k literal `replace` calls over the
    * bracket-delimited symbol string: pure codegen'd string ops, one
    * corpus scan, zero shuffles until the caller aggregates. Returns one
    * row per token: (w, syms) — the raw token and its encoded symbols. */
  private[graft] def encodeWords(docs: DataFrame,
      merges: Seq[(Int, String, String, Long)],
      carry: Seq[String] = Nil): DataFrame = {
    val cs = carry.map(col)
    docs.select(cs :+ explode(tokens(col("text"))).as("w"): _*)
      .filter(length(col("w")) >= 1)
      .select(cs :+ col("w") :+ encodeCol(merges).as("enc"): _*)
      .select(cs :+ col("w") :+ split(
        expr("substring(enc, 2, length(enc) - 2)"), SC + SO).as("syms"): _*)
  }

  /** q89 — corpus-wide symbol-usage histogram under the frozen trained
    * merges ([[BpeMerges]], rank order): the tokenizer-QA artifact that
    * shows which learned symbols actually fire at encode time (a merge
    * that never appears in the histogram is dead vocabulary). Top-k by
    * (count DESC, symbol ASC) — deterministic cut.
    *
    * Scale shape: the encode is a fixed chain of k literal `replace`
    * calls per token (map-side, whole-stage codegen, no UDF, no regex in
    * the hot loop); the only shuffle is the histogram aggregation whose
    * group count is bounded by the live vocabulary (charset + k merged
    * symbols) regardless of corpus size — ideal partial aggregation —
    * and the top-k is TakeOrdered, no global sort. Cost is one corpus
    * scan for any k.
    */
  def bpeEncodeHistogram(s: SparkSession, d: String, k: Int = 50): DataFrame =
    encodeWords(Tables.documentsScaled(s, d), BpeMerges.values)
      .select(explode(col("syms")).as("sym"))
      .groupBy("sym")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("sym"))
      .limit(k)

  /** q93 — tokenizer fertility by language: symbols-per-token under the
    * frozen trained merges, broken down by the q47 language verdict —
    * THE tokenizer-QA number multilingual pipelines watch (a tokenizer
    * trained on one language family over-fragments the others; fertility
    * >> 1.5 on a language means its text pays more sequence length per
    * word). Composition of two shipped kernels (langIdOf × encodeWords),
    * so verdicts and symbol counts cannot drift from q47/q89.
    *
    * Scale shape: classify + encode are map-side over one corpus scan;
    * the only shuffle is the per-language aggregation (≤ 24 groups).
    * Determinism: integer sums and one IEEE division — no carrier
    * needed.
    */
  def fertilityByLang(s: SparkSession, d: String): DataFrame =
    encodeWords(
      TextAnalysisOps.langIdOf(Tables.documentsScaled(s, d))
        .select(col("lang_pred"), col("text")),
      BpeMerges.values, carry = Seq("lang_pred"))
      .select(col("lang_pred"), size(col("syms")).cast("long").as("ns"))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_tokens"), sum(col("ns")).as("n_syms"))
      .select(col("lang_pred"), col("n_tokens"), col("n_syms"),
        (col("n_syms").cast("double") / col("n_tokens").cast("double")).as("fertility"))
      .orderBy("lang_pred")
}