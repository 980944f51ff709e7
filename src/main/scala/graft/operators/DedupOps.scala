package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
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

  /** Most recent persisted sorted-set index per session (see
    * ngramJaccardPrefix). */
  private val prefixSetsCaches =
    new SessionResourceCache[SparkSession, DataFrame](identity,
      _.unpersist(blocking = false))

  /** Most recent persisted label snapshot per (session, propagation
    * caller) — keyed by caller so the eager q55/q55b/q32 views can each
    * keep their own labeling cached (a session-only key meant registering
    * all three left only the last one live, and re-reading an earlier
    * eager view replayed its whole convergence loop through lineage —
    * correct but defeating the "leaves its result cached" contract). */
  private val groupsCaches =
    new SessionResourceCache[(SparkSession, String), org.apache.spark.rdd.RDD[_]](
      _._1, _.unpersist(blocking = false))

  /** Release THIS session's persisted dedup caches (sorted-set index,
    * label snapshots, signature table) — the explicit retirement hook a
    * session-cycling JVM calls; the context-stop sweep covers the rest
    * (see [[SessionResourceCache]]). Safe any time: the next call of the
    * owning operator re-persists. */
  def releaseSessionCaches(s: SparkSession): Unit = {
    prefixSetsCaches.releaseSession(s)
    groupsCaches.releaseSession(s)
    sigCaches.releaseSession(s)
  }

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

  /** See Tables.documentsScaled: spread the per-row kernels across cores
    * on few-split inputs; no added shuffle on a many-split corpus.
    */
  private def scaledDocs(s: SparkSession, d: String): DataFrame =
    Tables.documentsScaled(s, d)

  /** Per-doc distinct shingle sets, computed entirely map-side by the native
    * codegen kernel (graft.plans.ShingleKernels.shingles): one static call
    * per row inside whole-stage codegen. The round-1 row-based pipeline
    * (posexplode -> lead() window -> distinct) paid two wide shuffles before
    * dedup work started; this pays zero.
    */
  private[operators] def shingleSets(s: SparkSession, d: String): DataFrame =
    scaledDocs(s, d)
      .select(col("doc_id"), call_function("graft_shingles", col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** q41 — n-gram Jaccard near-duplicate pairs via an inverted shingle
    * index: group postings by shingle hash, then stream each shingle's
    * C(df,2) candidate pairs out of the lazy `graft_doc_pairs` generator
    * (ShingleExpressions.DocPairGen) — no self-join, no sort, no persisted
    * intermediate. Two shuffles total: posting → shingle buckets, pairs →
    * (doc_a, doc_b) shared-count aggregation. The Jaccard denominator rides
    * inline on every posting (per-doc shingle-set size `n`), so no count
    * join either.
    *
    * Candidate volume is bounded by shingle document frequency — the classic
    * posting-list bound. df=1 shingles can never form a pair and die on the
    * size filter losslessly; `dfCap` is the stop-shingle guard: at corpus
    * scale an ultra-common shingle makes pair generation (and the per-
    * shingle posting buffer) quadratic/linear in df on that one key, so
    * production callers cap it (recall/cost dial; pairs sharing *only*
    * stop-shingles have near-zero Jaccard anyway). The driver query runs
    * uncapped so the DuckDB oracle stays exact — the synthetic corpus has
    * no pathological stop-shingle, and the generator keeps memory O(df)
    * per shingle regardless (the pair stream is never materialized).
    */
  def ngramJaccard(s: SparkSession, d: String, dfCap: Long = Long.MaxValue,
      sampleFrac: Double = 1.0): DataFrame =
    ngramJaccardUnsorted(s, d, dfCap, sampleFrac)
      .orderBy("doc_a", "doc_b")

  /** [[ngramJaccard]] without the user-facing ordering — the seam for
    * composed queries (q86/q96/q96b ground truth) that feed the pairs
    * into a join + aggregate: the global sort is a pure wasted
    * range-exchange there (persist/union block EliminateSorts — found by
    * plan audit, round 17: q86 carried FOUR such sorts). */
  private[graft] def ngramJaccardUnsorted(s: SparkSession, d: String,
      dfCap: Long = Long.MaxValue, sampleFrac: Double = 1.0): DataFrame =
    sharedShingleCounts(s, d, dfCap, sampleFrac)
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")

  /** q41d — n-gram CONTAINMENT pairs: the asymmetric complement of q41's
    * resemblance join (Broder's resemblance-vs-containment split,
    * SEQUENCES '97). A short document quoted WHOLE inside a long one has
    * containment |A∩B|/|A| ≈ 1 while Jaccard |A∩B|/|A∪B| stays low (the
    * union is dominated by the long side) — the subsumption case every
    * symmetric near-dup join structurally misses, and exactly how
    * benchmark questions, licenses, and boilerplate hide inside long
    * scraped pages. Same machinery as q41 — ONE shared posting pipeline
    * ([[sharedShingleCounts]]: inverted shingle index, lazy pair
    * generator, shared-count aggregation; the scores can never disagree
    * about a pair's evidence — different score: containment of the
    * SMALLER set, shared / min(na, nb), gated at `threshold`. Output:
    * one row per pair with contained_id = the smaller set's doc (ties by
    * id — deterministic), container_id the other, plus both scores so a
    * consumer can see WHICH catch this is (high containment + low
    * jaccard = subsumption; both high = q41's near-dup).
    */
  def ngramContainment(s: SparkSession, d: String, threshold: Double = 0.8,
      dfCap: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1]; got $threshold")
    val smallerIsA = col("na") < col("nb") ||
      (col("na") === col("nb") && col("doc_a") < col("doc_b"))
    sharedShingleCounts(s, d, dfCap, sampleFrac = 1.0)
      .withColumn("containment", col("shared") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .select(
        when(smallerIsA, col("doc_a")).otherwise(col("doc_b")).as("contained_id"),
        when(smallerIsA, col("doc_b")).otherwise(col("doc_a")).as("container_id"),
        col("containment"), col("jaccard"))
      .orderBy("contained_id", "container_id")
  }

  /** The shared q41-family pair pipeline: inverted shingle index → lazy
    * per-shingle pair generation → ONE (doc_a, doc_b) shared-count
    * aggregation, returning (doc_a, doc_b, na, nb, shared) with
    * doc_a < doc_b. Jaccard (q41/q41b) and containment (q41d) are both
    * one score expression over THIS frame — the candidate evidence
    * cannot drift between the two joins. */
  private def sharedShingleCounts(s: SparkSession, d: String, dfCap: Long,
      sampleFrac: Double): DataFrame = {
    // df < 2 can never form a pair, so a cap below 2 would silently select
    // nothing — reject it rather than hand back an empty "dedup".
    require(dfCap >= 2, s"dfCap must be >= 2 (a shingle needs df >= 2 to form a pair); got $dfCap")
    // sampleFrac < 1 (q96's sampled sweep): the doc filter lands BEFORE
    // the shingle explode, so the whole pair pipeline rides the sample;
    // Jaccard between two docs is independent of the rest of the corpus,
    // so sampled pairs are exactly the full run's pairs with both ends
    // in the sample
    val posting = shingleSets(s, d)
      .filter(graft.Tables.sampleLine(col("doc_id"), sampleFrac))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"), explode(col("sh")).as("sh"))
    // Capped runs keep BOUNDED aggregation state: a dfCap+1-entry
    // graft_topk heap per shingle instead of collect_list. The old
    // collect-then-filter built the FULL posting buffer for a hot
    // boilerplate shingle and then threw it away — linear in df per key
    // in memory/GC exactly where the cap exists to bound work (measured:
    // 30x CPU across a corpus decade at sf10). A group survives only
    // when NOTHING was evicted (size <= dfCap < k), so kept groups carry
    // their complete posting list and the selection is bit-identical to
    // the unbounded construction. Uncapped runs need every posting
    // (C(df,2) pair generation is the query) — collect_list stays.
    val lists =
      if (dfCap < Int.MaxValue)
        posting.groupBy("sh")
          .agg(call_function("graft_topk",
            col("doc_id").cast("double"), col("doc_id"), col("n"),
            lit((dfCap + 1).toInt)).as("l"))
          .filter(size(col("l")) >= 2 && size(col("l")) <= lit(dfCap))
          .select(expr(
            "transform(l, e -> named_struct('doc_id', e.id, 'n', e.aux))").as("docs"))
      else
        posting.groupBy("sh")
          .agg(collect_list(struct(col("doc_id"), col("n"))).as("docs"))
          .filter(size(col("docs")) >= 2 && size(col("docs")) <= lit(dfCap))
    val pairs = lists
      .select(call_function("graft_doc_pairs", col("docs"))
        .as(Seq("doc_a", "doc_b", "na", "nb")))
    pairs
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
  }

  /** q41c — the same exact n-gram Jaccard join, prefix-filtered
    * (AllPairs/PPJoin family): under any global total order of shingles, two
    * sets with Jaccard >= t must share an element within their first
    * n - ceil(t*n) + 1 shingles — so only that PREFIX is indexed, and the
    * surviving candidate pairs are verified with one exact merge-walk
    * intersection (`graft_overlap`) over the full sorted sets.
    *
    * Same output as ngramJaccard bit-for-bit (the driver oracle IS q41's
    * SQL — the parity gate proves the filter lossless, like q34's salted
    * join). The 100 TB win over q41: the indexed posting list halves and
    * candidate volume drops superlinearly (only prefix collisions generate
    * pairs), at the price of re-joining the candidate list to the doc sets
    * for verification — the classic index-vs-verify trade the similarity-
    * join literature resolves in favor of prefix filtering once the corpus
    * no longer fits the count-everything aggregation.
    */
  def ngramJaccardPrefix(s: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]; got $threshold")
    // The sorted-set index feeds three subtrees (candidate build + both
    // verification join sides) and aliased subtrees are never unified by
    // exchange reuse — without the persist the corpus scan + shingle kernel
    // + sort would run three times. Materializing the index is the PPJoin
    // design point; the cache is spillable and, as with groupsCaches, each
    // invocation releases the PREVIOUS call's index so repeat callers hold
    // one live copy per session.
    val sets = shingleSets(s, d)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"),
        array_sort(col("sh")).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prefixSetsCaches.put(s, sets)
    // prefix under hash-ascending order: the completeness bound is
    // n - ceil(t*n) + 1; floor is used instead of ceil so any float
    // rounding of t*n can only LENGTHEN the prefix (never lose a pair)
    val prefix = slice(col("ss"), lit(1),
      (col("n") - floor(col("n") * lit(threshold)) + 1).cast("int"))
    val cand = sets
      .select(col("doc_id"), explode(prefix).as("sh"))
      .groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), lit(0L))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(call_function("graft_doc_pairs", col("docs"))
        .as(Seq("doc_a", "doc_b", "na", "nb")))
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("n").as("na"), col("ss").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("ss").as("sb")), "doc_b")
      .withColumn("shared", call_function("graft_overlap", col("sa"), col("sb")))
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private[graft] val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = NumHashes / Bands

  /** q42 — MinHash + LSH banding. The whole signature (16 portable hashes
    * -> 4 bands of 4) is computed per row by the native kernels
    * (graft_shingles |> graft_minhash) — zero shuffle until the band-bucket
    * join, whose key cardinality is rows x bands. This is the path that
    * stays cheap when the corpus no longer fits any pairwise approach: at
    * 100 TB each side of the bucket join is one map-side scan, and the
    * round-1 version's 3-shuffle signature pipeline (recomputed twice) is
    * gone entirely.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame =
    minhashPairsRaw(s, d)
      .distinct()
      .orderBy("doc_a", "doc_b")

  /** q86 — lexical dedup-index recall evaluation (the text counterpart
    * of q68's ANN recall): what fraction of the EXACT high-Jaccard pairs
    * (q41's inverted-index ground truth, Jaccard ≥ 0.5) each approximate
    * candidate generator catches, and at what candidate volume — MinHash
    * banding (q42) and SimHash multi-block banding (q43). The gate a
    * 100 TB dedup run checks before trusting its band/bit dials: banding
    * theory gives per-pair collision curves; this measures the corpus.
    * `jaccard_precision` is agreement with the Jaccard ground truth, not
    * a verdict on the candidates — SimHash targets hamming-near
    * fingerprints, a DIFFERENT similarity, and its gap to Jaccard truth
    * is exactly what this query makes visible. A method emitting zero
    * candidates emits no row.
    *
    * Scale shape: the three arms are their own already-scale-audited
    * queries; the evaluation adds one equi-join on 16-byte pair keys and
    * a 2-group aggregate — negligible next to the arms.
    */
  def dedupRecall(s: SparkSession, d: String): DataFrame = {
    // persisted: the ground truth feeds BOTH the 1-row total and the
    // candidate join — without it the expensive q41 arm runs twice
    // (aliased subtrees never unify by exchange reuse); Verify clears
    // cache between queries, the established shared-intermediate pattern
    // every arm through its UNSORTED seam: the evaluation join +
    // 2-group aggregate make each arm's user-facing orderBy a wasted
    // range-exchange here — the round-17 plan audit found FOUR of them
    // in this one query (persist/union block EliminateSorts)
    val exact = ngramJaccardUnsorted(s, d).select("doc_a", "doc_b")
      .withColumn("hit", lit(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = minhashPairsRaw(s, d).distinct().select("doc_a", "doc_b")
      .withColumn("method", lit("minhash"))
      .unionByName(simhashPairs(s, d).select("doc_a", "doc_b")
        .withColumn("method", lit("simhash")))
      // round 11: the winnow fingerprint index (q50c) as the third
      // candidate arm — position-local keys vs the whole-doc signatures
      .unionByName(CurationOps.winnowDedupOf(Tables.documentsScaled(s, d),
          k = 5, w = 4, dfCap = 64, minShared = 2, threshold = 0.35)
        .select("doc_a", "doc_b")
        .withColumn("method", lit("winnow")))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    // ONE left join + ONE aggregate produce both counts (the oracle's own
    // shape); n_candidates > 0 by construction (the group exists only
    // with rows), n_exact CAN be 0 on a degenerate corpus — recall is
    // then 0.0 by definition, never a 0/0 (whose NULL-vs-NaN engines
    // disagree on)
    cands.join(exact, Seq("doc_a", "doc_b"), "left")
      .groupBy("method")
      .agg(count(lit(1)).as("n_candidates"), count(col("hit")).as("n_caught"))
      .crossJoin(broadcast(nExact))
      .select(col("method"), col("n_candidates"), col("n_exact"), col("n_caught"),
        when(col("n_exact") > 0,
          col("n_caught").cast("double") / col("n_exact").cast("double"))
          .otherwise(lit(0.0)).as("recall"),
        (col("n_caught").cast("double") /
          col("n_candidates").cast("double")).as("jaccard_precision"))
      .orderBy("method")
  }

  /** The band-bucket candidate stream before distinct/ordering: a pair
    * agreeing on k bands appears k times. dedupGroups consumes this raw form
    * — duplicate symmetric edges cannot change a min-label propagation, so
    * it skips the distinct and global-sort shuffles the reporting query
    * (minhashLsh) pays for its user-facing contract.
    */
  /** LSH band rows (doc_id, band, sig) of a documents-shaped frame: the
    * whole 16-hash signature and its 4 band keys are computed per row by
    * the native kernels — zero shuffle.
    */
  /** The per-row MinHash signature column of a documents-shaped frame —
    * zero shuffle, one kernel chain per row. */
  private def signatures(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs
      .select((col("doc_id") +: carry.map(col)) :+
        call_function("graft_minhash", call_function("graft_shingles", col("text"))).as("mh"): _*)
      .filter(size(col("mh")) > 0)

  /** The 4 LSH band keys of a signature column `mh`, exploded to one
    * (band, sig) row each — the single definition of the band layout. */
  private def bandsOfSigs(sigs: DataFrame, keep: Seq[Column]): DataFrame =
    bandsOfSigsLayout(sigs, keep, Bands, RowsPerBand)

  /** [[bandsOfSigs]] under an arbitrary (nBands × rowsPerBand) layout of
    * the same 16-hash signature — the dial q96's operating curve sweeps.
    * nBands·rowsPerBand must tile the signature exactly. */
  private def bandsOfSigsLayout(sigs: DataFrame, keep: Seq[Column],
      nBands: Int, rowsPerBand: Int): DataFrame = {
    require(nBands * rowsPerBand == NumHashes,
      s"band layout $nBands x $rowsPerBand must tile $NumHashes hashes")
    val bandStructs = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(col("mh"), b * rowsPerBand + r + 1))
      struct(lit(b.toLong).as("band"), concat_ws(",", parts: _*).as("sig"))
    }
    sigs.select(keep :+ explode(array(bandStructs: _*)).as("bb"): _*)
      .select(keep :+ col("bb.band").as("band") :+ col("bb.sig").as("sig"): _*)
  }

  /** Band rows with optional carried-through columns (the streaming ingest
    * guard carries its watermark column; batch callers carry nothing).
    */
  private[graft] def bandRows(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    bandsOfSigs(signatures(docs, carry), col("doc_id") +: carry.map(col))

  /** Candidate (doc_a, doc_b) pairs streamed from per-bucket doc lists via
    * the lazy graft_doc_pairs generator — the shared pair-generation tail
    * of every LSH-bucketed query (see minhashPairsRaw for why this beats a
    * self-join). `bucketed` must carry (band, sig, doc_id). */
  private def pairsFromBuckets(bucketed: DataFrame): DataFrame =
    bucketed
      .groupBy("band", "sig")
      .agg(collect_list(struct(col("doc_id"), lit(0L))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(call_function("graft_doc_pairs", col("docs"))
        .as(Seq("doc_a", "doc_b", "na", "nb")))
      .select("doc_a", "doc_b")

  private def minhashPairsRaw(s: SparkSession, d: String): DataFrame =
    // Bucket pair-gen via the same inverted-index shape as q41: group by the
    // band bucket, stream C(k,2) pairs from the lazy graft_doc_pairs
    // generator. The previous aliased self-join ran the scan + minhash
    // kernel on BOTH sides (exchange reuse does not unify aliased self-join
    // subtrees) and paid two sorts; this runs them once with zero sorts.
    // A bucket of k near-identical docs yields the C(k,2) pairs the query
    // exists to report — the buffer is the doc-id list (8B·k), not the pairs.
    pairsFromBuckets(bandRows(scaledDocs(s, d)))

  /** Most recent persisted signature table per session (see minhashEst). */
  private val sigCaches =
    new SessionResourceCache[SparkSession, DataFrame](identity,
      _.unpersist(blocking = false))

  /** THE per-session persisted (doc_id, mh) signature table — one live
    * copy shared by every signature consumer (q42b's estimate, q82b's
    * fuzzy decontamination): the 64-byte/doc index a production corpus
    * materializes once. Each call re-derives the frame and releases the
    * previous session copy (the established one-live-copy policy). */
  private[graft] def sigTable(s: SparkSession, d: String): DataFrame = {
    val sigs = signatures(scaledDocs(s, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigCaches.put(s, sigs)
    sigs
  }

  /** [[bandsOfSigs]] over an external signature table, doc_id carried —
    * the q82b seam (band layout single-sourced). */
  private[graft] def bandsOfSigTable(sigs: DataFrame): DataFrame =
    bandsOfSigs(sigs, Seq(col("doc_id")))

  /** q42b — signature-estimated Jaccard for the LSH candidate pairs: the
    * fraction of the 16 MinHash positions on which a candidate pair agrees
    * is an unbiased estimate of its true Jaccard — the standard
    * verification-free dial for filtering LSH false positives WITHOUT ever
    * touching the raw text again (at 100 TB the signature table is the
    * 64-bytes-per-doc index you materialize anyway; re-reading documents to
    * verify candidates is the thing this avoids).
    *
    * The signature table is persisted because it feeds three subtrees (the
    * bucket pair generation and both join sides) and aliased subtrees never
    * unify under exchange reuse — same design point as q41c's sorted-set
    * index, same one-live-copy cache policy.
    */
  def minhashEst(s: SparkSession, d: String): DataFrame = {
    val sigs = sigTable(s, d)
    val pairs = pairsFromBuckets(bandsOfSigs(sigs, Seq(col("doc_id")))).distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("mh").as("ma")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("mh").as("mb")), "doc_b")
      .withColumn("n_agree",
        size(filter(zip_with(col("ma"), col("mb"), (x, y) => x === y), b => b)).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        (col("n_agree").cast("double") / lit(NumHashes.toDouble)).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** The band layouts q96 sweeps: every exact tiling of the 16-hash
    * signature, from 16 bands of 1 (max recall, max candidates) to 2
    * bands of 8 (min candidates, only near-identical docs collide). */
  private[graft] val CurveLayouts: Seq[(Int, Int)] =
    Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** q96 — the LSH banding OPERATING CURVE: q86's recall evaluation swept
    * over every band layout of the same 16-hash signature — the dial
    * table an operator reads before committing a 100 TB dedup run to one
    * banding (banding theory gives the per-pair collision probability
    * 1−(1−j^r)^b; this measures the corpus: candidate volume, recall
    * against q41's exact Jaccard ground truth, and Jaccard precision per
    * layout). The ANN side has q68c's recall-vs-nprobe curve; this is the
    * lexical twin. A layout emitting zero candidates emits no row (the
    * q86 convention).
    *
    * Scale shape: ONE signature computation (persisted — it feeds all
    * four layouts), each arm one band-bucket aggregation + the lazy pair
    * generator (never doc×doc), ground truth computed once (persisted)
    * and joined once per arm on 16-byte pair keys. The sweep costs ~4×
    * one q42, not 4× (signatures + ground truth amortize).
    */
  def bandCurve(s: SparkSession, d: String, sampleFrac: Double = 1.0): DataFrame = {
    // sampleFrac < 1: the documented sampled-sweep dial — a 100 TB
    // operator derives the banding table from a deterministic corpus
    // sample (Tables.sampleLine, the q36 device). BOTH the candidate
    // arms and the exact ground truth run on the same sampled doc set
    // (sampling only one side would corrupt recall); pair-valued
    // quantities shrink ~frac², rate-valued ones (recall, precision)
    // estimate the full corpus (spec pins agreement on the gate lake).
    val sigs = signatures(scaledDocs(s, d)
        .filter(graft.Tables.sampleLine(col("doc_id"), sampleFrac)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unsorted seam: the truth feeds a join + aggregate only (see q86)
    val exact = ngramJaccardUnsorted(s, d, sampleFrac = sampleFrac)
      .select("doc_a", "doc_b")
      .withColumn("hit", lit(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val arms = CurveLayouts.map { case (nb, r) =>
      pairsFromBuckets(bandsOfSigsLayout(sigs, Seq(col("doc_id")), nb, r))
        .distinct()
        .withColumn("n_bands", lit(nb.toLong))
        .withColumn("rows_per_band", lit(r.toLong))
    }.reduce(_ unionByName _)
    arms.join(exact, Seq("doc_a", "doc_b"), "left")
      .groupBy("n_bands", "rows_per_band")
      .agg(count(lit(1)).as("n_candidates"), count(col("hit")).as("n_caught"))
      .crossJoin(broadcast(nExact))
      .select(col("n_bands"), col("rows_per_band"),
        col("n_candidates"), col("n_exact"), col("n_caught"),
        when(col("n_exact") > 0,
          col("n_caught").cast("double") / col("n_exact").cast("double"))
          .otherwise(lit(0.0)).as("recall"),
        (col("n_caught").cast("double") /
          col("n_candidates").cast("double")).as("jaccard_precision"))
      .orderBy("rows_per_band")
  }

  /** q62 — incremental dedup: triage one incoming source batch against the
    * existing corpus — the "new crawl vs corpus" pass that keeps a growing
    * lake duplicate-free without ever re-deduping what is already in it.
    * Each new doc gets a verdict: `exact` (content hash exists), `neardup`
    * (shares a MinHash band bucket with an existing doc), or `unique`.
    *
    * Scale shape: the existing corpus collapses to its distinct content
    * hashes and distinct band buckets (both linear, both map-side-computed
    * signatures), and the new batch left-joins those on the hash/bucket —
    * cost scales with the BATCH, never with batch×corpus; the corpus-side
    * index sets are exactly what a production lake would maintain
    * incrementally.
    */
  def incrementalDedup(s: SparkSession, d: String, newSource: String = "src0"): DataFrame = {
    // scaledDocs: the minhash kernel passes below parallelize on few-split
    // inputs like every other kernel-heavy dedup operator
    val docs = scaledDocs(s, d)
    val newDocs = docs.filter(col("source") === newSource)
    val existing = docs.filter(col("source") =!= newSource)
    val existingHashes = existing
      .select(md5(col("text").cast("binary")).as("text_hash")).distinct()
      .withColumn("is_exact", lit(1))
    val existingBuckets = bandRows(existing)
      .select("band", "sig").distinct()
      .withColumn("is_near", lit(1))
    val nearHits = bandRows(newDocs)
      .join(existingBuckets, Seq("band", "sig"), "left")
      .groupBy("doc_id")
      .agg(max(col("is_near")).as("is_near"))
    newDocs
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .join(existingHashes, Seq("text_hash"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, lit("exact"))
          .when(col("is_near") === 1, lit("neardup"))
          .otherwise(lit("unique")).as("verdict"))
      .orderBy("doc_id")
  }

  /** q43 — SimHash fingerprint + Hamming near-dup pairs via LOSSLESS
    * multi-block banding (Manku, Jain & Das Sarma, WWW 2007 §3): the
    * 60-bit fingerprint splits into 6 blocks of 10 bits, and by
    * pigeonhole any pair within Hamming distance 3 touches at most 3
    * blocks, so at least 3 of 6 blocks agree — hence at least one of the
    * C(6,3)=20 three-block COMBINATIONS agrees in full. Joining on
    * (combo, packed 3-block key) therefore finds every qualifying pair,
    * like single-band banding, but the key is 30 bits wide instead of 8:
    * random (non-near-dup) bucket collisions fall as 20·n²/2^30 —
    * negligible into the 10⁸-doc range. Both dials matter at scale and
    * both were measured at sf10 (500k docs): single 8-bit bands on the old
    * ~30-bit fingerprint ran 47× wall for 10× data (birthday-quadratic
    * CANDIDATES), and the short fingerprint itself made unrelated docs
    * collide within hd≤3 at ~n²·2^-30 (quadratic OUTPUT). The fingerprint
    * is one native kernel call per row (graft_simhash — the round-1
    * explode + per-bit-sum groupBy paid a full shuffle for what is per-row
    * arithmetic); candidates scale with combo-bucket sizes.
    */
  // (offset, width) of the 6 fingerprint blocks; three 10-bit block
  // values pack into a 30-bit key with 10-bit lanes (private[graft] for
  // the losslessness property test)
  private[graft] val simhashBlocks = (0 until 6).map(b => (b * 10, 10))
  private[graft] val simhashCombos: Seq[Seq[Int]] = (0 until 6).combinations(3).toSeq

  /** [[simhash]]'s pair stream without the user-facing ordering — the
    * seam for composed consumers (q86) whose join + aggregate make the
    * global sort a wasted range-exchange (see ngramJaccardUnsorted). */
  private[graft] def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sims = scaledDocs(s, d)
      .select(col("doc_id"), call_function("graft_simhash", col("text")).as("simhash"))
    def blockVal(sh: Column, i: Int): Column = {
      val (off, w) = simhashBlocks(i)
      shiftright(sh, off).bitwiseAND(lit((1L << w) - 1))
    }
    val banded0 = sims.select(col("doc_id"), col("simhash"),
      explode(array(simhashCombos.zipWithIndex.map { case (c, ci) =>
        struct(lit(ci.toLong).as("band"),
          (shiftleft(blockVal(col("simhash"), c(0)), 20)
            .bitwiseOR(shiftleft(blockVal(col("simhash"), c(1)), 10))
            .bitwiseOR(blockVal(col("simhash"), c(2)))).as("bval"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bval"))
    // The 60-bit two-hash fingerprint fills all lanes with ~balanced sign
    // bits, so combo buckets are no longer skewed by construction (the old
    // ~30-bit fingerprint's dead high bits concentrated whole bands). The
    // repartition below remains for one reason only: when the build side
    // broadcasts, join parallelism follows the probe side's scan
    // partitions, so a small few-split input (exactly the
    // broadcast-eligible case) must be spread across cores by doc_id. On a
    // many-split input the scan already parallelizes — and if a natural
    // near-dup cluster still makes a bucket hot, AQE's skew-join splitting
    // carves it at runtime; an unconditional repartition would be a pure
    // wasted pass there.
    val parallelism = s.sparkContext.defaultParallelism
    val banded = if (banded0.rdd.getNumPartitions < parallelism)
      banded0.repartition(parallelism, col("doc_id")) else banded0
    // A pair agreeing on k combos is found k times by the bucket join;
    // rather than shuffling the whole pair stream through distinct(), each
    // pair is emitted exactly once — by its FIRST agreeing combo, decided
    // locally from the fingerprint XOR (a combo agrees iff the xor bits
    // under its three block masks are all zero).
    val z = col("a.simhash").bitwiseXOR(col("b.simhash"))
    val comboMasks = simhashCombos.map(_.map { i =>
      val (off, w) = simhashBlocks(i); ((1L << w) - 1) << off
    }.reduce(_ | _))
    val firstAgree = comboMasks.zipWithIndex.foldRight(lit(comboMasks.size.toLong): Column) {
      case ((mask, ci), rest) =>
        when(z.bitwiseAND(lit(mask)) === 0, lit(ci.toLong)).otherwise(rest)
    }
    banded.as("a").join(banded0.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(z) <= 3 && col("a.band") === firstAgree)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(z).cast("long").as("hamming"))
  }

  def simhash(s: SparkSession, d: String): DataFrame =
    simhashPairs(s, d).orderBy("doc_a", "doc_b")

  /** q55 — duplicate GROUPS from the pair stream: connected components
    * over the MinHash candidate graph, each document labeled with its
    * component's minimum doc_id (the canonical copy to keep — the step
    * that turns pairwise dedup output into an actionable keep/drop list).
    *
    * Distributed label propagation: every round each node takes the min
    * label among itself and its neighbors; converges in O(component
    * diameter) rounds — near-dup clusters are shallow (tens of docs, dense),
    * so a handful of rounds closes even a 100 TB corpus, and each round is
    * one join + one aggregation on the (small) edge set. The convergence
    * check is a single driver-side count per round.
    */
  def dedupGroups(s: SparkSession, d: String, maxRounds: Int = 50): DataFrame =
    dedupGroupsImpl(s, d, maxRounds, keys = None)

  /** q55c — the duplicate-cluster SIZE HISTOGRAM: how many groups of
    * each size the near-dup graph contains (size 1 = the non-duplicated
    * mass) — the forensics figure a dedup report leads with: a heavy
    * tail means boilerplate families, and the histogram decides how
    * aggressive group dedup must be before a 100 TB run commits.
    * q55's labeling + two bounded aggregations (group count ≤ corpus,
    * histogram rows ≤ max group size); its propagation snapshot caches
    * under its OWN key so the eager q55/q55b views are not evicted.
    */
  def dedupGroupSizes(s: SparkSession, d: String, maxRounds: Int = 50): DataFrame =
    dedupGroupsImpl(s, d, maxRounds, keys = None, cacheKeyOverride = Some("groups-sizes"))
      .groupBy("canonical").agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_groups"))
      .orderBy("group_size")

  /** q55d — the DEDUP-SAVINGS dashboard: what group dedup would actually
    * remove, per source — doc and token attrition if every non-canonical
    * member of a q55 component dropped. The figure a dedup report pairs
    * with q55c's histogram (the histogram says how duplication is
    * SHAPED; this says what it COSTS and which sources carry it — the
    * budget evidence for per-source dedup aggressiveness and for q64's
    * mixing weights). q55's labeling + one corpus join on doc_id + one
    * catalog-bounded rollup; its propagation snapshot caches under its
    * OWN key so the eager q55/q55b/q55c views are not evicted.
    */
  def dedupSavings(s: SparkSession, d: String, maxRounds: Int = 50): DataFrame = {
    val labels = dedupGroupsImpl(s, d, maxRounds, keys = None,
      cacheKeyOverride = Some("savings"))
      .select(col("doc_id"), col("is_canonical"))
    import graft.functions.TextFunctions.tokens
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("nt"))
      .join(labels, Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("is_canonical"), 1L).otherwise(0L)).as("n_dropped"),
        sum(col("nt")).as("tokens_total"),
        sum(when(!col("is_canonical"), col("nt")).otherwise(0L)).as("tokens_dropped"))
      .withColumn("doc_drop_frac",
        col("n_dropped").cast("double") / col("n_docs").cast("double"))
      .withColumn("token_drop_frac",
        col("tokens_dropped").cast("double") / col("tokens_total").cast("double"))
      .orderBy("source")
  }

  /** q55b — duplicate groups with a PRIORITY canonical: the same connected
    * components as q55, but the kept copy of each group is the member with
    * the most-trusted SOURCE (ties by doc_id) instead of the min doc_id —
    * the policy real pipelines want when the same document arrives from a
    * curated dump and a noisy crawl (q84's overlap matrix is exactly the
    * evidence that cross-source duplicates exist). Trust = the source's
    * rank in sorted source order (deterministic; a production run passes
    * its own trust table).
    *
    * Implementation: the SAME min-label propagation, over packed keys
    * trust·2⁴⁰ + doc_id — a total order, so the fixpoint/convergence proof
    * is q55's verbatim and the group PARTITION is provably identical to
    * q55's (spec-pinned); only the decoded representative differs. Costs
    * one broadcast rank join on the corpus and two bounded key joins on
    * the edge-node set over q55.
    */
  def dedupGroupsPriority(s: SparkSession, d: String, maxRounds: Int = 50): DataFrame = {
    val docs = Tables.documents(s, d)
    // bounded source vocabulary -> deterministic trust table, driver-side;
    // max(doc_id) rides the same one-pass aggregation to validate the
    // packed-key layout BEFORE packing: a doc_id >= 2^40 (or a trust rank
    // >= 2^23) would silently corrupt both the min ordering and the
    // decoded canonical — fail loudly instead (hash-derived ids at corpus
    // scale can genuinely exceed 40 bits; a caller with such ids must
    // densify them first).
    val head = docs.agg(
      collect_set(col("source")).as("srcs"),
      max(col("doc_id")).as("max_doc"), min(col("doc_id")).as("min_doc"))
      .collect()(0)
    val srcs = head.getSeq[String](0).sorted.zipWithIndex
    if (!head.isNullAt(1)) { // empty corpus: nothing to pack, no hazard
      val maxDoc = head.getLong(1)
      require(maxDoc < (1L << 40),
        s"dedupGroupsPriority packs trust*2^40 + doc_id; max(doc_id)=$maxDoc >= 2^40 " +
          "would corrupt the packed order — densify doc ids first")
      require(head.getLong(2) >= 0,
        s"dedupGroupsPriority requires non-negative doc ids; min=${head.getLong(2)}")
    }
    require(srcs.length < (1 << 23),
      s"trust rank ${srcs.length} sources >= 2^23 overflows the packed key")
    import s.implicits._
    val ranks = srcs.toSeq.toDF("source", "trust")
    val keys = docs.join(broadcast(ranks), "source")
      .select(col("doc_id"),
        (col("trust").cast("long") * lit(1L << 40) + col("doc_id")).as("k"))
    dedupGroupsImpl(s, d, maxRounds, keys = Some(keys))
  }

  private def dedupGroupsImpl(s: SparkSession, d: String, maxRounds: Int,
      keys: Option[DataFrame], cacheKeyOverride: Option[String] = None): DataFrame = {
    // packed priority keys decode back to their node via the low 40 bits —
    // the pointer-jump step needs label values to resolve to node ids
    val decode: Column => Column =
      if (keys.isEmpty) identity else (c: Column) => c % lit(1L << 40)
    val labels = propagateMin(s, minhashPairsRaw(s, d), maxRounds, keys, decode,
      cacheKey = cacheKeyOverride.getOrElse(
        if (keys.isEmpty) "groups-min" else "groups-priority"))
    val joined = keys match {
      case None =>
        Tables.documents(s, d).select("doc_id")
          .join(labels.withColumnRenamed("canonical", "c"), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("c"), col("doc_id")).as("canonical"))
      case Some(kdf) =>
        // decode the packed key back to the winning doc_id; a doc outside
        // every pair is its own canonical (its own key decodes to itself)
        Tables.documents(s, d).select("doc_id")
          .join(kdf, Seq("doc_id"))
          .join(labels.withColumnRenamed("canonical", "c"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            (coalesce(col("c"), col("k")) % lit(1L << 40)).as("canonical"))
    }
    joined
      .withColumn("is_canonical", (col("doc_id") === col("canonical")).cast("boolean"))
      .orderBy("doc_id")
  }

  /** Min-label propagation over an undirected pair stream — the shared
    * connected-components engine of q55/q55b (duplicate groups) and q32
    * (track stitching). `pairsIn` carries one row per undirected edge
    * (first two columns are the endpoints); `keys` optionally remaps the
    * propagated total order (doc_id -> packed priority key). Returns
    * (doc_id, canonical) for every node incident to an edge — canonical
    * is the component's minimum label (key when remapped). The returned
    * frame's snapshot stays cached for the caller's lazy consumption;
    * each invocation releases the previous snapshot under the SAME
    * `cacheKey` (one live labeling per (session, caller), so the eager
    * q55/q55b/q32 views never evict each other). */
  private[graft] def propagateMin(s: SparkSession, pairsIn: DataFrame,
      maxRounds: Int, keys: Option[DataFrame] = None,
      decodeKey: Column => Column = identity,
      cacheKey: String = "default"): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1; got $maxRounds")
    // materialize-and-truncate: persist the rows as an RDD, rebuild the
    // DataFrame over it (a flat LogicalRDD plan). This keeps per-round
    // planning cost constant — with plain persist every round re-analyzes
    // the ever-deeper iterative plan and planning dominates wall time —
    // while keeping an explicit handle for releasing the blocks (which
    // localCheckpoint would leave to driver GC). `parts > 0` right-sizes
    // the snapshot's partition count to the data (see below).
    def materialize(df: DataFrame, parts: Int = 0, changedCol: Option[String] = None)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], Long) = {
      // change detection fuses into the snapshot count: the accumulator
      // ticks while the persist pass runs, so a round is ONE job, not a
      // count + a second filter-count over the same snapshot. Task retries
      // can only inflate an accumulator — and a row with changed=false adds
      // 0 no matter how often it replays — so the `== 0` convergence test
      // stays exact.
      val acc = changedCol.map(_ => s.sparkContext.longAccumulator("changed"))
      val changedIdx = changedCol.map(df.schema.fieldIndex)
      val rdd0 = (acc, changedIdx) match {
        case (Some(a), Some(i)) =>
          df.rdd.map { r => if (!r.isNullAt(i) && r.getBoolean(i)) a.add(1L); r }
        case _ => df.rdd
      }
      val rdd = (if (parts > 0 && parts < rdd0.getNumPartitions) rdd0.coalesce(parts) else rdd0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // a job failure inside this count (executor loss, OOM) would otherwise
      // strand the half-cached blocks with no handle left to free them
      val n = try rdd.count() catch {
        case e: Throwable => rdd.unpersist(blocking = false); throw e
      }
      (s.createDataFrame(rdd, df.schema), rdd, acc.map(_.value.longValue).getOrElse(n))
    }
    val pcols = pairsIn.columns
    val pairs = pairsIn.select(col(pcols(0)).as("doc_a"), col(pcols(1)).as("doc_b"))
    var (edges, edgesRdd, edgeCount) = materialize(
      pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("u", "v"))
    // The edge set is orders of magnitude smaller than the corpus (it is the
    // near-dup candidate stream), so the iterative phase right-sizes its
    // parallelism to the data instead of inheriting the corpus scan's: at
    // 100 TB `k` stays at cluster width, while a small edge set collapses to
    // a handful of partitions so each round is a few tasks, not
    // defaultParallelism-many per job. Same idea AQE applies to shuffles,
    // done here by hand because the loop runs over raw persisted RDDs. The
    // narrowing is a LAZY coalesce over the already-persisted blocks — a
    // second persisted copy of the edge set bought nothing but an extra
    // pass (reading 32 cached blocks through a k-way coalesce is free).
    val k = math.min(s.sparkContext.defaultParallelism.toLong, edgeCount / 500000L + 1L).toInt
    if (k < edgesRdd.getNumPartitions)
      edges = s.createDataFrame(edgesRdd.coalesce(k), edges.schema)
    // only documents that appear in a pair can change label — the
    // propagation loop runs on that (much smaller) node set and the rest of
    // the corpus joins back as its own canonical at the end. The node set
    // and the FIRST propagation round fuse into one aggregation: every
    // node's initial canonical is min(self, direct neighbors), so the loop
    // below starts one round ahead (its first pass is pure verification on
    // star-shaped components, the common near-dup case).
    var (labels, labelsRdd, _) = materialize(
      keys match {
        case None =>
          edges.groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("canonical"))
            .select(col("u").as("doc_id"), col("canonical"))
        case Some(kdf) =>
          // label VALUES are the packed priority keys; the same min-label
          // fixpoint over a different total order. Both key joins touch
          // only the edge-node set (small by construction).
          edges
            .join(kdf.select(col("doc_id").as("u"), col("k").as("ku")), Seq("u"))
            .join(kdf.select(col("doc_id").as("v"), col("k").as("kv")), Seq("v"))
            .groupBy(col("u"))
            .agg(least(min(col("ku")), min(col("kv"))).as("canonical"))
            .select(col("u").as("doc_id"), col("canonical"))
      }, k)
    var round = 0
    var converged = false
    try {
      while (!converged && round < maxRounds) {
        val nbrMin = edges.join(labels, edges("v") === labels("doc_id"))
          .groupBy(col("u")).agg(min("canonical").as("nbr_min"))
        val stepped = labels.join(nbrMin, labels("doc_id") === nbrMin("u"), "left")
          .select(labels("doc_id"),
            col("canonical").as("c0"),
            least(col("canonical"), coalesce(col("nbr_min"), col("canonical"))).as("c1"))
        // POINTER JUMP (path doubling): c1 names a node in this component
        // (decodeKey inverts a packed priority key back to its node), and
        // that node's own label may already be smaller — taking it makes
        // labels hop 2^round edges instead of one, so convergence is
        // O(log diameter) rounds. Chain-shaped components (q32's tracks)
        // would otherwise pay one round PER EDGE of track length; min is
        // monotone and label(c1) sits in the same component, so the
        // fixpoint — the component minimum — is untouched. Change
        // detection stays inline (final < previous) and rides the
        // snapshot's own persist pass (materialize's accumulator).
        val jumped = least(col("c1"), coalesce(col("jc"), col("c1")))
        val (next, nextRdd, changed) = materialize(
          stepped.join(
            labels.select(col("doc_id").as("jd"), col("canonical").as("jc")),
            decodeKey(stepped("c1")) === col("jd"), "left")
            .select(stepped("doc_id"),
              jumped.as("canonical"),
              (jumped < col("c0")).as("__changed")),
          k, changedCol = Some("__changed"))
        labelsRdd.unpersist(blocking = false) // exactly one label snapshot live
        labels = next.drop("__changed")
        labelsRdd = nextRdd
        converged = changed == 0
        round += 1
      }
    } finally {
      edgesRdd.unpersist(blocking = false)
      // every abnormal exit — non-convergence throw below, or a job failure
      // mid-round — must release the current snapshot, or it leaks with no
      // handle left to free it
      if (!converged) labelsRdd.unpersist(blocking = false)
    }
    // a component whose min-label distance exceeds maxRounds would silently
    // keep duplicates — refuse to return a non-converged labeling
    if (!converged) throw new IllegalStateException(
      s"dedupGroups did not converge within $maxRounds rounds — raise maxRounds " +
        "(a component's min-label eccentricity exceeds it)")
    // the converged fixpoint is unique; the final snapshot stays cached for
    // the caller's (lazy) consumption — so this call cannot free it itself.
    // As with postingCaches, each invocation instead releases the PREVIOUS
    // call's snapshot under the same key, bounding repeat callers (Bench
    // best-of-3, registerQueries) to one live labeling per (session, caller).
    groupsCaches.put((s, cacheKey), labelsRdd)
    lastPropagationRounds.set(round)
    labels
  }

  /** Diagnostic seam: the round count of the most recent [[propagateMin]]
    * convergence (test-only — DomainOpsSpec pins the pointer-jumping
    * log₂(diameter) bound through it). */
  private[graft] val lastPropagationRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Hyperplane sign-bit block id over `v` — THE shared dense-corpus
    * blocking key: q44b/q44c and blocked SemDeDup all derive their
    * sub-blocks from this one formula, and the planes themselves come
    * from [[SimilarityOps.hyperplane]] (table 0) — the SAME family
    * knnLsh buckets with, structurally, not by convention. bits MUST
    * grow with per-partition density: a FIXED block count over a growing
    * corpus is quadratic in disguise (measured at sf10 — see SURVEY §6). */
  private[graft] def signBlocks(v: Column, bits: Int): Column =
    if (bits == 0) lit(0L)
    else (0 until bits).map { j =>
      when(dot(v, lit(SimilarityOps.hyperplane(0, j))) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** q44 — embedding-cosine near-duplicate pairs, blocked on the label
    * column (standard ER blocking: pair generation only within blocks, so
    * candidates scale with the largest block, not the corpus).
    *
    * `subBlockBits` is the dominant-block guard: label blocking alone is
    * quadratic in the largest block, so when one label dominates the corpus
    * (the 100 TB failure mode) callers split every block by `subBlockBits`
    * random-hyperplane sign bits — pair generation then runs within
    * (label, hyperplane-bucket) and candidates shrink by ~2^bits for the
    * hot label. Recall trade: only pairs on the same side of every plane
    * survive, which is exactly the high-cosine pairs the threshold keeps
    * (cosine-LSH collision probability 1 - theta/pi per plane). 0 = exact
    * (the driver query, so the DuckDB oracle stays exact); 8 = the q44c
    * density setting.
    */
  /** The data-dependent density dial: smallest `bits` whose dominant block
    * shrinks to ≤ targetPop expected members — `bits = min b : maxPop ≤
    * target·2^b`, i.e. ceil(log2(maxPop/target)) computed in exact integer
    * arithmetic (no float log at a power-of-two boundary), clamped to the
    * 16-plane family. SURVEY §6 proved any FIXED block count is quadratic
    * in disguise: 10× data with constant bits is 100× pairs; with this
    * dial, bits grows by log2(10) ≈ 3.3 and per-block pair volume stays
    * flat. The DuckDB oracles reproduce the same choice with the same
    * integer predicate over the same counts.
    */
  private[graft] def autoBits(maxPop: Long, targetPop: Long): Int = {
    require(targetPop > 0, s"targetPop must be positive; got $targetPop")
    (0 to 16).find(b => maxPop <= (targetPop << b)).getOrElse(16)
  }

  /** q44d — [[embeddingNearDup]] with the dial chosen from the data: one
    * cheap driver-side aggregation (max label-block population over a
    * 1-column scan — at 100 TB this comes from the lake's partition/
    * manifest stats instead) picks `subBlockBits` via [[autoBits]]. The
    * fleet-scale contract: re-running the same job on 10× the corpus
    * re-derives a dial ~3.3 bits higher and keeps per-block pair volume
    * constant, with no human re-tuning the constant.
    */
  /** max over zero groups is NULL — an empty embeddings table must pick a
    * dial, not NPE. The DuckDB oracles' COALESCE(MIN(b), 16) yields 16
    * in that case (no b satisfies a NULL predicate), so the Scala side
    * mirrors 16 exactly; on an empty corpus every dial produces the same
    * empty pair set, but the dial VALUES staying equal keeps the
    * oracle-vs-engine choice from ever diverging. */
  private def maxPopOf(agged: DataFrame): Option[Long] = {
    val row = agged.head
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  def embeddingNearDupAuto(s: SparkSession, d: String, targetPop: Long = 32): DataFrame = {
    val maxPop = maxPopOf(Tables.embeddings(s, d)
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .agg(max("cnt")))
    embeddingNearDup(s, d, maxPop.map(autoBits(_, targetPop)).getOrElse(16))
  }

  def embeddingNearDup(s: SparkSession, d: String, subBlockBits: Int = 0): DataFrame = {
    require(subBlockBits >= 0 && subBlockBits <= 16, s"subBlockBits in [0,16]; got $subBlockBits")
    val base = Tables.embeddingsScaled(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val e = base.withColumn("blk", signBlocks(col("v"), subBlockBits))
    // shuffle_hash, NEVER broadcast: this is a self-join of the CORPUS —
    // the one table that grows without bound. Catalyst's size estimate of
    // the compressed parquet scan sits under the broadcast threshold at
    // test SFs and would ship the whole vector table to every task; at
    // 100 TB that plan is an OOM, and even locally the hash build of the
    // full corpus serializes what the (label, blk) shuffle parallelizes.
    e.as("a").hint("shuffle_hash").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.blk") === col("b.blk") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") > 0.25)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** q67 — semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings with the trained
    * coarse quantizer, then prune, WITHIN each cluster only, every vector
    * that has an above-threshold cosine neighbor with a lower id (min-id
    * keeps the representative — deterministic, no random tie-break).
    * Emits the pruned rows: (vec_id, n_dups, rep_id, max_cos).
    *
    * Scale shape: this is the whole point of SemDeDup — the O(n^2) cosine
    * comparison is confined to cluster-local pairs, and at 100 TB the
    * cluster COUNT grows (retrain k-means|| with k ~ n/target_size) while
    * per-cluster membership stays bounded, so pair volume stays linear in
    * corpus size. Assignment is map-side (broadcast centroids, one corpus
    * pass, same shape as q46b/q54); candidate pairs stream from the lazy
    * `graft_doc_pairs` generator (no self-join — the bucket buffer is
    * 8B x members, never the pairs); verification fetches vectors by id
    * join, the standard ANN-verify fetch, instead of carrying 512-byte
    * vectors through the groupBy buffer.
    */
  /** q67c — [[semanticDedup]] with the dial chosen from the data: the
    * dominant CLUSTER population under the frozen quantizer (exactly
    * q54's health histogram — one broadcast-assign pass, no pairs) picks
    * `subBlockBits` via [[autoBits]]. The assignment pass runs twice
    * (once to count, once inside the dedup) — both are the linear stage;
    * the dial exists to keep the quadratic stage from growing at all.
    */
  /** The semantic density dial measured from an arbitrary prepared
    * embedding frame `(vec_id, v, nrm)`: histogram the frame under the
    * frozen quantizer (q54's health check — one broadcast-assign pass, no
    * pairs) and pick the min bits that bound the dominant cluster to
    * ≤ targetPop expected members. This is what [[semanticDedupAuto]]
    * runs on the whole corpus and what CorpusPrep's semantic stage runs
    * on ITS surviving frontier — the dial always measures the population
    * the quadratic stage will actually see. */
  def autoSemanticBitsOf(s: SparkSession, e: DataFrame, targetPop: Long = 32): Int = {
    val maxPop = maxPopOf(SimilarityOps.ivfListBalanceOf(s, e).agg(max("n_vectors")))
    maxPop.map(autoBits(_, targetPop)).getOrElse(16)
  }

  def semanticDedupAuto(s: SparkSession, d: String, threshold: Double = 0.3,
      targetPop: Long = 32): DataFrame =
    semanticDedup(s, d, threshold, autoSemanticBitsOf(s,
      Tables.embeddingsScaled(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v"))), targetPop))

  def semanticDedup(s: SparkSession, d: String, threshold: Double = 0.3,
      subBlockBits: Int = 0): DataFrame =
    semanticDedupOf(s,
      Tables.embeddingsScaled(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v"))),
      threshold, subBlockBits)

  /** [[semanticDedup]] over an arbitrary prepared embedding frame
    * `(vec_id: long, v: array<double>, nrm: double)` — the entry point
    * pipeline stages use (CorpusPrep joins its surviving doc ids against
    * the emitted drop list with vec_id = doc_id). Same shape, same frozen
    * quantizer, same min-id-keeps-representative rule. */
  def semanticDedupOf(s: SparkSession, e: DataFrame, threshold: Double,
      subBlockBits: Int = 0): DataFrame = {
    require(subBlockBits >= 0 && subBlockBits <= 16, s"subBlockBits in [0,16]; got $subBlockBits")
    val cents = SimilarityOps.centroidTable(s)
    // argmax via max_by — map-side partials, no per-vector candidate sort
    // (same rework as the q54/q46b assignment); ties keep the smallest
    // list. `blk` (the shared hyperplane sign-block key) rides the
    // grouping — functional on vec_id, cardinality unchanged. With the
    // CLUSTER count frozen, per-cluster population grows linearly with
    // the corpus and within-cluster pairs quadratically (129× wall for
    // 10× data measured at sf10); sub-blocking caps pair growth exactly
    // as q44b guards q44 — the standard density dial, traded against
    // recall of cross-block neighbors.
    val asg = e.withColumn("blk", signBlocks(col("v"), subBlockBits))
      .join(broadcast(cents))
      .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .groupBy("vec_id", "blk")
      .agg(max_by(col("list_id"), struct(col("csim"), -col("list_id"))).as("list_id"))
    val pairs = asg.groupBy("list_id", "blk")
      .agg(collect_list(struct(col("vec_id"), lit(0L).as("n"))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(call_function("graft_doc_pairs", col("docs"))
        .as(Seq("vec_a", "vec_b", "na", "nb")))
      .select("vec_a", "vec_b")
    // shuffle_hash on BOTH verify joins, NEVER broadcast (the q44 rule one
    // join over): the pair stream's size estimate is the ≤lists·2^bits-row
    // aggregate feeding the generator, so Catalyst would happily pick a
    // broadcast — and collecting the generated pairs materializes the
    // dominant block's quadratic blowup in one driver-bound task (measured:
    // a 6 GiB single-task result at sf10 under bits=0). The corpus side's
    // compressed-scan estimate can dip under the threshold too. Hinting the
    // embedding sides keeps the join shuffled with a bounded per-task build.
    pairs
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("nra"))
        .hint("shuffle_hash"), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nrb"))
        .hint("shuffle_hash"), "vec_b")
      .withColumn("cos", cosine(col("va"), col("vb"), col("nra"), col("nrb")))
      .filter(col("cos") >= threshold)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(count(lit(1)).as("n_dups"), min("vec_a").as("rep_id"), max("cos").as("max_cos"))
      .orderBy("vec_id")
  }
}
