package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}

import graft.operators._

/** Plan-shape audit (SURVEY.md §6): asserts the physical plans are the ones
  * a 100 TB deployment needs — broadcasts where expected, filters and
  * projections pushed into the parquet scan, no stray shuffles.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: predicates and projection reach the parquet scan") {
    val p = plan(RelationalOps.filterPushdown(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(p.contains("l_extendedprice") && !p.contains("l_returnflag"))
  }

  test("q03/q05: dimension joins broadcast, no shuffle joins") {
    val p3 = plan(RelationalOps.joinAgg(spark, sf))
    assert(p3.contains("BroadcastHashJoin"))
    val p5 = plan(RelationalOps.multiJoin(spark, sf))
    assert(p5.contains("BroadcastHashJoin") && !p5.contains("SortMergeJoin"))
  }

  test("q06: single scan, aggregation only — no joins, no expand") {
    val p = plan(RelationalOps.scanAgg(spark, sf))
    assert(!p.contains("Join") && p.contains("HashAggregate"))
  }

  test("q41: pair generation streams from the posting lists — no self-join, no sort") {
    val p = plan(DedupOps.ngramJaccard(spark, sf))
    // the inverted index is one aggregation + one generator: pairs stream
    // out of graft_doc_pairs, so the plan must carry NO join of any kind
    // and no persisted intermediate
    assert(!p.contains("Join"), p)
    assert(p.contains("Generate") && p.contains("graft_doc_pairs"), p)
    assert(!p.contains("InMemoryTableScan"), p)
    // the posting key column `sh` is a long hash, not a string
    assert(p.contains("sh: bigint") || p.contains("sh#"))
  }

  test("q45: corpus side never shuffles — query set broadcasts") {
    val p = plan(SimilarityOps.knnBruteForce(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q54/q44b: centroid/probe tables broadcast; corpus never pre-shuffles") {
    val p54 = plan(SimilarityOps.ivfListBalance(spark, sf))
    // assignment is map-side: the 16-centroid table broadcasts
    assert(p54.contains("BroadcastNestedLoopJoin") || p54.contains("BroadcastHashJoin"))
    val p44b = plan(DedupOps.embeddingNearDup(spark, sf, subBlockBits = 3))
    // blocked self-join is an equi-join on (label, blk), never a cartesian
    assert(!p44b.contains("CartesianProduct"), p44b)
  }

  test("q44: the corpus self-join shuffles on (label, blk) — NEVER broadcasts the corpus") {
    // Catalyst's compressed-scan estimate sits under the broadcast
    // threshold at test SFs and would ship the whole vector table to
    // every task — an OOM at 100 TB. The shuffle_hash hint must hold.
    for (bits <- Seq(0, 8)) {
      val p = plan(DedupOps.embeddingNearDup(spark, sf, subBlockBits = bits))
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
        s"bits=$bits: corpus self-join broadcasts\n$p")
      assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    }
  }

  test("q67: the pair-verify joins shuffle — NEVER broadcast pairs or corpus") {
    // The pair stream's size estimate is the ≤lists·2^bits-row aggregate
    // feeding the generator, so Catalyst would broadcast it — and
    // collecting the generated pairs materializes the dominant block's
    // quadratic blowup in one driver-bound task (a measured 6 GiB
    // single-task result at sf10 under bits=0). The embedding sides'
    // compressed-scan estimate can dip under the threshold too. Only the
    // 16-centroid assignment join may broadcast.
    for (bits <- Seq(0, 6)) {
      val p = plan(DedupOps.semanticDedup(spark, sf, subBlockBits = bits))
      // count node headers, not tree lines (formatted explain lists each
      // node twice)
      val broadcasts = """\(\d+\) Broadcast(?:Hash|NestedLoop)Join""".r.findAllIn(p).size
      assert(broadcasts <= 1, s"bits=$bits: a verify join broadcasts\n$p")
      assert("""\(\d+\) ShuffledHashJoin""".r.findAllIn(p).size >= 2, p)
    }
  }

  test("q69: the 128-row codebook broadcasts; assignment stays map-side") {
    val p = plan(SimilarityOps.pqStats(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q67: assignment broadcasts centroids; pairs stream from the generator, no cartesian") {
    val p = plan(DedupOps.semanticDedup(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("Generate") && p.contains("graft_doc_pairs"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q37: one window partitioning serves all manifest aggregates") {
    val p = plan(RosbagDomainOps.mp4ManifestIndex(spark, sf))
    // the n_frames/start/end/fps window aggregates and the row_number all
    // partition by user_id: the frame stream shuffles ONCE, not per-agg
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"manifest shuffles $exchanges times:\n$p")
  }

  test("q21: sessionize rides ONE user_id shuffle — lag, flag, running sum, agg share it") {
    val p = plan(RosbagDomainOps.sessionize(spark, sf))
    // lag -> new-session flag -> running session id are all windows over
    // user_id; the closing aggregation groups by (user_id, session);
    // everything after the first hashpartitioning is partition-local
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"sessionize shuffles $exchanges times:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q26: as-of join is one user_id-partitioned merge — no cartesian, no per-row probe join") {
    val p = plan(RosbagDomainOps.asofJoin(spark, sf))
    // both event streams hash-partition by user_id and the as-of match
    // resolves inside the partition (union + window, or a single
    // partitioned join) — never a cross product or a nested-loop probe
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"asof join shuffles $exchanges times:\n$p")
  }

  test("q104: voxel downsample is ONE partial-agg shuffle with a pruned scan") {
    val p = plan(PointCloudOps.voxelTable(spark, sf))
    // map-side partial aggregation on (sweep, voxel) -> one exchange ->
    // final aggregate; the sort is the driver-output convention over the
    // grid-bounded result, never a second hash shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"voxel downsample shuffles $exchanges times:\n$p")
    assert(!p.contains("Join"), p)
    // projection pruned to the five lineitem columns the sweep synthesis
    // reads, not the full 11-column schema
    assert(p.contains("l_partkey") && !p.contains("l_shipdate"), p)
  }

  test("q29d: greedy NMS rides ONE (image, class) shuffle into the typed kernel") {
    val p = plan(RosbagDomainOps.nmsTable(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one exchange keys the groups; the rangepartitioning sort after it is
    // the driver-output ordering convention
    assert(exchanges <= 1, s"nms shuffles $exchanges times:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("q56: contamination is an inverted-index join on the shingle hash, no doc-by-doc compare") {
    val p = plan(CurationOps.contamination(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q58: both stratification windows ride one shuffle on lang") {
    val p = plan(CurationOps.stratifiedSample(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"stratified sample shuffles $exchanges times:\n$p")
  }

  test("q59: quantization kernel runs in the scan stage — no shuffle before the label rollup") {
    val p = plan(CurationOps.quantizeStats(spark, sf))
    // one partial+final aggregate pair over one exchange; kernel is map-side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"quantize stats shuffles $exchanges times:\n$p")
    assert(p.contains("graft_q8_stats"), p)
  }

  test("q43: no distinct shuffle after the band join (first-agreeing-band)") {
    val p = plan(DedupOps.simhash(spark, sf))
    // dedup is decided locally from the fingerprint XOR; the only
    // aggregation-like node allowed is none at all before the final sort
    assert(!p.contains("HashAggregate"), p)
  }

  test("q63: both aggregation levels ride the one doc_id repartition") {
    val p = plan(CurationOps.gopherQuality(spark, sf))
    // hash(doc_id) co-locates every (doc_id, word) group, so the per-word
    // counts and the per-doc rollup add no exchange beyond the repartition
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"gopher quality shuffles $exchanges times:\n$p")
  }

  test("q64: the 1-row normalizer broadcasts; the rollup partial-aggregates") {
    val p = plan(CurationOps.sourceMix(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q65: inverted-index equi-join on the run hash, no cartesian, no posting lists") {
    val p = plan(CurationOps.dupRuns(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // per-hash state is the (min, max) extent aggregate — never collect_list
    assert(!p.contains("collect_list"), p)
  }

  test("q83/q83b: span discovery is equi-joins on the hash key — no cartesian, no posting lists") {
    val p = plan(CurationOps.dupSpans(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the ownership probe joins on the 8-byte run hash, never doc×doc
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    val pb = plan(CurationOps.cutDupSpans(spark, sf))
    assert(!pb.contains("CartesianProduct") && !pb.contains("BroadcastNestedLoopJoin"), pb)
  }

  test("q84: one bounded set aggregate straight over the explode — no join, no extra pass") {
    val df = CurationOps.sourceOverlap(spark, sf)
    // walk the physical tree (pre-order: parents before children), not
    // the explain STRING — "ObjectHashAggregate" contains the substring
    // "HashAggregate", so string matching cannot distinguish them
    val names = df.queryExecution.sparkPlan.collect { case n => n.nodeName }
    // the per-hash source set is ONE partial+final object-aggregate pair
    // with map-side dedup (collect_set ignores duplicate occurrences);
    // an explicit pre-distinct would be a redundant third aggregation —
    // Catalyst provably folds one away, so none may appear between the
    // window explode (the deepest Generate) and the set partial
    assert(names.count(_ == "ObjectHashAggregate") === 2, names.mkString(", "))
    val lastObj = names.lastIndexWhere(_ == "ObjectHashAggregate")
    val belowSetAgg = names.drop(lastObj + 1)
    assert(belowSetAgg.contains("Generate"), names.mkString(", "))
    assert(!belowSetAgg.exists(_.contains("Aggregate")), names.mkString(", "))
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
  }

  test("q81: both retrieval sides are bounded top-k — no global sort, no window at all") {
    val df = operators.SimilarityOps.hybridRrf(spark, sf)
    val p = plan(df)
    // the cosine side must rank via TakeOrderedAndProject (distributed
    // top-k), never a full Sort of corpus-sized data; the k-row lists are
    // then ranked by the bounded graft_topk aggregate, so the plan
    // carries NO Window node — nothing to log the single-partition
    // "No Partition Defined for Window" warning at scale
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"q81 should rank via graft_topk, found:\n$windows")
  }

  test("q81b: per-query top-k via the bounded aggregate — no corpus sort, no global window") {
    val df = operators.SimilarityOps.hybridRrfMulti(spark, sf)
    val p = plan(df)
    // the semantic side reduces through graft_topk (bounded map-side
    // heaps), so the plan carries no Sort of corpus-sized data and no
    // rank window over an unpartitioned corpus
    assert(p.contains("graft_topk"), p)
    assert(!p.contains("CartesianProduct"), p)
    // every Window node is partitioned (query_id or the literal lexical
    // key): an empty partition spec would be the single-partition
    // bottleneck warning q81's windows used to log
    val optimized = df.queryExecution.optimizedPlan
    val emptySpecs = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(emptySpecs.isEmpty, s"unpartitioned windows:\n$emptySpecs")
  }

  test("q73b: one corpus scan serves every query — no Window, no per-query pass, stats broadcast") {
    val df = operators.TextAnalysisOps.bm25PerQuery(spark, sf)
    val p = plan(df)
    // per-query ranking rides graft_topk's bounded heaps: NO Window node
    // at all (logical plan), no sort of corpus-sized data
    assert(p.contains("graft_topk"), p)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"q73b should rank via graft_topk, found:\n$windows")
    // scan count of the documents table must not grow with the query
    // count — and since the all-long perDoc frame is persisted (stats
    // AND scoring consume it), the corpus file is scanned exactly ONCE
    // for any number of queries; both consumers read the cache
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("documents")) => f
    }
    assert(scans.length <= 1, s"expected <=1 documents file scan, got ${scans.length}:\n$p")
    val cached = df.queryExecution.sparkPlan.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }
    assert(cached.length == 2, s"expected 2 perDoc cache reads, got ${cached.length}:\n$p")
    // the 1-row stats side reaches the scoring pass as a broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q46d/q54b: auto-k CORPUS assignment is the in-register kernel — no corpus×centroid join") {
    // the frozen-16 arms legitimately broadcast-nested-loop the corpus
    // against the centroid table (k is a constant 16); once k grows with
    // the corpus that shape is n×k row churn, so in the auto arms the
    // only nested-loop join allowed is the BOUNDED probe resolution
    // (10 queries × k centroids — every embeddings scan under it must
    // carry the pushed vec_id < 10 query filter); the corpus reaches its
    // list through MapPartitions (the kernel), never a join
    val exec46d = SimilarityOps.knnIvfAuto(spark, sf).queryExecution.sparkPlan
    val nlj = exec46d.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    nlj.foreach { j =>
      val scans = j.collect { case f: FileSourceScanExec => f }
      scans.foreach { f =>
        assert(f.metadata.get("PushedFilters").exists(_.contains("LessThan(vec_id,10)")),
          s"corpus-side scan under a nested-loop join: ${f.metadata.get("PushedFilters")}")
      }
    }
    // the kernel is genuinely in the plan, and the probe join on list_id
    // broadcasts the bounded query side
    assert(exec46d.collect {
      case m: org.apache.spark.sql.execution.MapPartitionsExec => m }.nonEmpty)
    assert(plan(SimilarityOps.knnIvfAuto(spark, sf)).contains("BroadcastHashJoin"))
    // q54b: pure kernel + one bounded aggregation — no join of any kind
    val p54b = plan(SimilarityOps.ivfListBalanceAuto(spark, sf))
    assert(!p54b.contains("Join"), p54b)
    assert(p54b.contains("HashAggregate"), p54b)
  }

  test("q70b: every join is broadcast-side (codebooks, centroids, probed queries) — corpus never shuffle-joins") {
    val p = plan(operators.SimilarityOps.knnIvfPq(spark, sf))
    // the corpus only ever joins against broadcast frames (16 centroids,
    // 128 codebook rows, nprobe x queries probe subs); a SortMergeJoin
    // would mean corpus-sized data shuffled for a join — the shape that
    // dies first at 10^9 vectors
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q91: the B-bounded ratio table broadcasts; the corpus stream never sort-merge-joins") {
    val p = plan(CurationOps.dsirWeights(spark, sf))
    // the whole point of hashed features: both model tables are <= B rows
    // by construction, so scoring is a broadcast join at ANY corpus size
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q95: the frozen model broadcasts; the corpus stream never sort-merge-joins") {
    // the scoring stage's contract at 100 TB: the <= B-row weight table
    // is always the broadcast side, and the corpus featurization never
    // shuffles on a token key — its only exchange is the per-doc rollup
    val p = plan(graft.operators.Clf.scoreTable(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q89: the encode is one scan - no join, no shuffle before the bounded histogram") {
    val p = plan(operators.Bpe.bpeEncodeHistogram(spark, sf))
    assert(!p.contains("Join"), p)
    // scan -> explode/encode/explode -> partial agg -> ONE exchange ->
    // final agg -> TakeOrdered; the spread-scan repartition of a
    // single-file test input adds at most one round-robin exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"encode histogram shuffles $hashEx times: $p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q50b: the winnow selection kernel is shuffle-free — no Exchange, no Window, no Join") {
    // the round-11 array-kernel claim, pinned: a doc's whole hash stream
    // lives in its own row, so selection needs no partitioned Window and
    // no shuffle at all (the driver query's presentation orderBy is the
    // only exchange in q50b itself — the KERNEL must stay map-side, which
    // is also what makes it legal mid-stream for the winnow guard)
    val p = plan(operators.CurationOps.winnowSelectedOf(
      Tables.documents(spark, sf), 5, 4))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q01: partial (map-side) aggregation before the exchange") {
    val p = plan(RelationalOps.pricingSummary(spark, sf))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // formatted plan lists operators leaf-to-root; a partial aggregate must
    // exist in addition to the final one
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2)
  }

  test("q100: band filter feeds bounded topk partials — no Window, no cartesian pair blowup") {
    val df = operators.SimilarityOps.hardNegatives(spark, sf)
    val p = plan(df)
    // ranking rides graft_topk's map-side partials (partial_graft_topk
    // before the exchange); the only join is the broadcast of the
    // bounded query set with the band predicate applied IN the join
    assert(p.contains("partial_graft_topk"), p)
    assert(!p.contains("CartesianProduct"), p)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"q100 should rank via graft_topk, found:\n$windows")
  }

  test("q82b: every hash build is a bounded frame — the corpus signature table never broadcasts") {
    val p = plan(operators.CurationOps.deconFuzzy(spark, sf))
    // three explicit broadcasts (held bands, candidates, candidates+sig),
    // no sort-merge join, no cartesian: the estimate-driven plan at test
    // SFs picked the corpus-sized signature table as the hash build (the
    // q44 lesson) before the explicit pins
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // formatted mode lists operators twice (tree + details): 3 joins
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3, p)
  }

  test("q95b/q95c: the scoring kernel is UNORDERED — no corpus sort reaches the aggregating consumers") {
    // the round-10 review found Clf.scoreOf/lmScoreOf/dsirWeights ending
    // in orderBy(doc_id), which survived into every aggregating
    // consumer's physical plan as a corpus-wide range-sort exchange
    // (EliminateSorts does not fire across the explode/join subtrees).
    // Pin the fix: the only Sort in q95b's plan is its 9-row output
    // ordering (by threshold), never one keyed on doc_id.
    val curve = plan(operators.Clf.thresholdCurve(spark, sf))
    val sorts = curve.split('\n').filter(_.contains("Sort ["))
    assert(!sorts.exists(_.contains("doc_id")),
      s"scoring kernel leaked a doc_id sort into q95b:\n${sorts.mkString("\n")}")
    // q95c executes eagerly (1-row result) — assert on the stats subtree
    // it builds instead: scoreOf itself must carry no Sort at all
    val score = plan(operators.Clf.scoreTable(spark, sf))
    assert(score.split('\n').count(_.contains("Sort [")) <= 2,
      s"scoreTable should carry only its own output ordering:\n$score")
  }

  test("q46e: IMI corpus assignment is ONE kernel pass off the pruned scan; " +
    "probe lists broadcast — the corpus never hash-shuffles before the kernel") {
    val p = plan(SimilarityOps.knnImi(spark, sf))
    // corpus side: pruned scan (vec_id >= corpus floor) -> spreadScan's
    // round-robin -> the typed kernel; the only hash exchanges are the
    // bounded per-query rank and the probe-list window
    assert(p.contains("MapPartitions"), s"kernel missing:\n$p")
    assert(p.contains("GreaterThanOrEqual(vec_id,10)"),
      s"corpus filter must reach the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe lists must broadcast:\n$p")
    val corpusShuffles = p.split('\n')
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("list_id"))
    assert(corpusShuffles === 0, s"corpus hash-shuffled on list_id:\n$p")
    // round 16: the query side is the multi-sequence FRONTIER kernel —
    // no K² grid join anywhere, so no BroadcastNestedLoopJoin may remain
    // on the probe path and a cartesian over anything would be a defect
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"frontier probes must not join the cell grid:\n$p")
  }

  test("q105: the spectral table is bounded aggregation work — no join, no cartesian") {
    val p = plan(graft.multimodal.AudioOps.spectralTable(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // distinct clip ids + the per-clip pack are the only exchanges (plus
    // the driver-output ordering)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"spectral table shuffles $exchanges times:\n$p")
  }

  test("q108: drift monitor is one corpus scan — centroids and watermark broadcast, " +
    "no sort-merge join, no cartesian blowup") {
    val p = plan(SimilarityOps.indexDrift(spark, sf))
    assert(!p.contains("SortMergeJoin"), p)
    // the centroid join and the 1-row watermark ride broadcasts
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // corpus-side work: the argmax partial-aggregates map-side (the q54
    // shape) — at most the vec_id agg + the bounded list rollups shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"drift monitor shuffles $exchanges times:\n$p")
  }

  test("q110: the PSI table is a bounded LOCAL relation — the corpus work ran " +
    "in two bounded-output aggregations, nothing distributed remains") {
    // the first draft built the 11-row table as a distributed union whose
    // rollup branch re-executed the corpus subtrees (8x the CPU at sf10);
    // the shape pin is that the RESULT plan is local
    val p = plan(TextAnalysisOps.qualityDrift(spark, sf))
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q106: the entropy profile is a PURE MAP — zero shuffles, no join, " +
    "no aggregate; only the driver-output range sort") {
    val p = plan(TextAnalysisOps.entropyProfile(spark, sf))
    assert(!"Exchange hashpartitioning".r.findAllIn(p).hasNext,
      s"entropy profile hash-shuffles:\n$p")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
    // projection pruned to the two referenced columns
    assert(p.contains("doc_id") && !p.contains("n_chars"), p)
  }
}
