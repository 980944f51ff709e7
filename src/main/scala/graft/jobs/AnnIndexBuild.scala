package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFunctions._
import graft.operators.{IvfCentroids, PqCodebooks, PqResidualCodebooks, SimilarityOps}

/** Persisted IVFADC index as a partitioned lake table — the build-once /
  * query-many serving shape a production vector index actually runs
  * (q70b recomputes coarse and code assignment inside every query; real
  * corpora assign once at ingest and amortize over every search).
  *
  *   <out>/list_id=<L>/part-*.parquet    rows (vec_id, codes[8])
  *
  * Build: one corpus scan through `SimilarityOps.codedCorpusSubs` — THE
  * same coarse-argmax + PQ-argmin kernel q70b executes in-query, so the
  * persisted codes cannot drift from the in-query assignment — written
  * `partitionBy(list_id)`. The parquet carries ONLY codes — 8 small ints
  * a codec packs to ~4 bytes/vector, the compression that fits 10⁹
  * vectors in a cluster's page cache; the float embeddings are never
  * read again at query time.
  *
  * Search: probes become PARTITION PRUNING. ONE bounded query-side job
  * resolves each query's nProbe nearest lists AND collects the query
  * vectors (both sized by the query batch, never the corpus); the probed
  * list ids become a LITERAL `list_id IN (...)` filter that prunes the
  * scan to the probed directories before a single file opens — at 16
  * lists / 2 probes the planner reads ≤ 1/8 of the index, and the
  * fraction falls as nlists grows. Scoring is the asymmetric-distance
  * LUT: per (query, subspace, code) distances — 8×16 rows per query —
  * computed driver-side from the collected vectors in the same left-fold
  * IEEE order as q70b's `aggregate(zip_with(...))` chain and broadcast,
  * so each candidate costs 8 lookup-adds and results are bit-identical
  * to the recompute-everything query (spec-pinned).
  *
  * VERSIONED variant ([[buildVersioned]]/[[searchVersioned]]): the same
  * code table committed through SnapshotLake with list_id stats — index
  * rebuilds are ATOMIC (a half-built index is invisible until its
  * manifest publishes; a rebuild while serving never tears a reader) and
  * searches can pin a version (reproduce yesterday's retrieval during an
  * index migration). Probes prune via the manifest's per-file list_id
  * ranges instead of directory names — ONE [[SnapshotLake.readRangeIn]]
  * over ALL probed lists (single manifest read, single version
  * resolution; per-list reads could each resolve a different latest
  * under a concurrent rebuild and stitch a torn cross-version result —
  * see [[searchVersioned]]), O(1) file opens per probed list on the
  * list-clustered layout.
  *
  * Reference counterpart: none — the reference pipeline has no vector
  * index; this extends the ANN family (q45/q46/q46b/q70/q70b) with the
  * lake-layout half a 100 TB deployment needs.
  */
object AnnIndexBuild {

  private val SubDim = 8
  private val NSub = 8

  /** (vec_id, list_id, sub_idx, code) rows -> one row per vector with
    * codes[8] — array_sort on (sub_idx, code) pairs so codes[i] is
    * subspace i's code regardless of aggregation order. */
  private def aggCodes(subs: DataFrame): DataFrame =
    subs.groupBy("vec_id", "list_id")
      .agg(transform(array_sort(collect_list(struct(col("sub_idx"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** The corpus as one row per (vec_id, list_id, codes[8]).
    * `residual = true` codes r = v - c(v) against the residual-trained
    * books (IVFADC proper, q70c's coding — the production default per
    * Jégou §IV.A); false codes v against the raw books (q70b). A table's
    * coding is an INVARIANT: every build/append/search against it must
    * pass the same flag, or ADC scores silently rank against the wrong
    * reconstruction (the directory build records a `_coding` marker and
    * search validates it; versioned tables document the contract). */
  private def codedTable(s: SparkSession, sfDir: String, residual: Boolean): DataFrame =
    aggCodes(SimilarityOps.codedCorpusSubs(s, sfDir, residual))

  /** Coding-marker sidecar for directory indexes: what the codes MEAN. */
  private def codingName(residual: Boolean) = if (residual) "residual" else "raw"

  private def writeCodingMarker(s: SparkSession, out: String, residual: Boolean): Unit =
    writeMarker(s, out, codingName(residual))

  private def writeMarker(s: SparkSession, out: String, name: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(out, "_coding")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val os = fs.create(path, true)
    try os.write(name.getBytes("UTF-8")) finally os.close()
  }

  private def checkCodingMarker(s: SparkSession, indexDir: String, residual: Boolean): Unit =
    checkMarkerIs(s, indexDir, codingName(residual))

  private def checkMarkerIs(s: SparkSession, indexDir: String, expected: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(indexDir, "_coding")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a MISSING marker fails too (advisor finding, round 8): every build
    // writes one, so its absence means this is not a directory this tool
    // built (or the marker was deleted) — scoring against guessed
    // reconstruction semantics is exactly the silent mis-ranking the
    // marker exists to prevent
    require(fs.exists(path),
      s"index $indexDir carries no _coding marker — not an index directory " +
        "written by AnnIndexBuild.build (or the marker was deleted); refusing " +
        "to guess whether its codes are raw or residual")
    val in = fs.open(path)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    require(stored == expected,
      s"index $indexDir was built with $stored coding; searched as $expected " +
        "— ADC scores would rank against the wrong reconstruction (an auto-k " +
        "index must be searched with searchAuto, a frozen one with search)")
  }

  /** Table-property key recording a versioned index's coding — the same
    * invariant the directory `_coding` marker pins, but carried in each
    * snapshot's manifest (SnapshotLake propagates properties across
    * append/rewrite/compaction commits, so a tombstone fold can't strip
    * it), and validated per pinned VERSION: a v1 built raw stays
    * searchable as raw after a residual v2 rebuild overwrites the table. */
  private val CodingProp = "coding"

  private def checkVersionedCoding(s: SparkSession, table: String,
      version: Option[Long], residual: Boolean): Unit =
    SnapshotLake.propsOf(s, table, version).get(CodingProp) match {
      case Some(stored) => require(stored == codingName(residual),
        s"index table $table (version ${version.map(_.toString).getOrElse("latest")}) " +
          s"was committed with $stored coding; searched as ${codingName(residual)} " +
          "— ADC scores would rank against the wrong reconstruction")
      case None => log.warn(s"index table $table carries no '$CodingProp' property " +
        s"(committed by an older writer?) — cannot verify ${codingName(residual)} coding")
    }

  /** One pass over the corpus embeddings -> the partitioned code table. */
  def build(s: SparkSession, sfDir: String, out: String, residual: Boolean = false): Unit = {
    codedTable(s, sfDir, residual)
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
    writeCodingMarker(s, out, residual)
  }

  /** Marker value for auto-k indexes: a frozen-quantizer `search` against
    * auto-partitioned lists would resolve probes with the WRONG quantizer
    * and silently rank against the wrong candidates — the marker makes
    * the mismatch loud in both directions. */
  private val AutoCoding = "raw-auto"

  /** The persisted index under the AUTO-k quantizer (q46d's dial carried
    * to the serving side — the frozen build's 16 lists mean the serving
    * nprobe probes a constant FRACTION of a growing corpus; here k ≈ √n,
    * so probed rows per query grow ~√n): trains the quantizer
    * deterministically (SimilarityOps.autoQuantizer — cached per
    * session/lake), assigns lists through the in-register kernel, PQ-codes
    * through THE shared tail, lands `partitionBy(list_id)` with the
    * centroids as a `_quantizer` parquet SIDECAR (underscore-prefixed:
    * invisible to the main partitioned read) so the index is
    * self-describing — search needs no session-level frozen constant.
    * Raw coding only: the shipped residual books are trained against the
    * FROZEN quantizer's residuals (see codedSubsAuto).
    */
  def buildAuto(s: SparkSession, sfDir: String, out: String): Unit = {
    val (_, cents) = SimilarityOps.autoQuantizer(s, sfDir)
    val emb = graft.Tables.embeddings(s, sfDir)
      .filter(col("vec_id") >= SimilarityOps.QueryIdMax)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    aggCodes(SimilarityOps.codedSubsAuto(s, graft.Tables.spreadScan(s, emb), cents))
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
    import s.implicits._
    cents.toSeq.zipWithIndex.map { case (cv, i) => (i.toLong, cv.toSeq) }
      .toDF("list_id", "cv")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/_quantizer")
    writeMarker(s, out, AutoCoding)
  }

  /** [[search]] over a [[buildAuto]] index: probes resolve against the
    * SIDECAR quantizer (parquet doubles round-trip bit-exactly, so
    * assignment-time and search-time centroids are THE same numbers);
    * the ADC LUT is raw-mode (centroid-free), so scoring is unchanged.
    * Default nProbe keeps the frozen serving point's probed FRACTION
    * (ceil(k/8) lists — 2/16 at the pinned baseline). Note the scale
    * trade the dial controls: a FIXED nprobe scans nprobe·n/k ≈
    * nprobe·√n rows per query (sub-linear — what q46d's oracled arm
    * runs at nprobe=2) but its probed fraction shrinks as the corpus
    * grows, costing recall on weakly-clustered data; a fixed FRACTION
    * (this default) holds recall but scans linearly. The resolution is
    * measurement, not a constant: read the serving dial off
    * `SimilarityOps.annRecallCurveAuto` (q68e) for YOUR corpus — the
    * smallest nprobe clearing the target recall — before production.
    */
  def searchAuto(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = -1): DataFrame = {
    checkMarkerIs(s, indexDir, AutoCoding)
    val cents = s.read.parquet(s"$indexDir/_quantizer")
      .withColumn("cnrm", graft.functions.VectorFunctions.norm(col("cv")))
    val nLists = cents.count()
    val probe = if (nProbe > 0) nProbe else math.max(1, (nLists / 8).toInt)
    val (probes, lutRows) = probeAndLut(s, sfDir, probe, residual = false, cents = cents)
    if (probes.isEmpty) return emptyResult(s)
    val probedLists = probes.map(_._2).distinct.sorted
    val codes = s.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists: _*))
    adcTopK(s, codes, probes, lutRows, k)
  }

  /** Marker value for IMI indexes — same loudness contract as
    * [[AutoCoding]]: probing multi-index cells with a flat quantizer (or
    * vice versa) would silently rank against the wrong candidates. */
  private val ImiCoding = "raw-imi"

  /** The persisted index under the INVERTED MULTI-INDEX quantizer (q46e
    * carried to the serving side — the composition claim made concrete:
    * cells are just list ids, so the `partitionBy(list_id)` layout, the
    * PQ coding tail, the ADC LUT, and the scoring tail are all UNCHANGED
    * from the flat/auto builds). Trains the two per-half codebooks
    * deterministically (SimilarityOps.imiQuantizer — cached per
    * session/lake), assigns cells through the per-half kernel, PQ-codes
    * through THE shared tail, lands `partitionBy(list_id)` with the half
    * codebooks as a `_quantizer` parquet sidecar tagged by half. Raw
    * coding only (the auto arm's contract). */
  def buildImi(s: SparkSession, sfDir: String, out: String): Unit = {
    val (_, cb1, cb2) = SimilarityOps.imiQuantizer(s, sfDir)
    val emb = graft.Tables.embeddings(s, sfDir)
      .filter(col("vec_id") >= SimilarityOps.QueryIdMax)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    aggCodes(SimilarityOps.codedSubsImi(s, graft.Tables.spreadScan(s, emb), cb1, cb2))
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
    import s.implicits._
    (cb1.toSeq.zipWithIndex.map { case (cv, i) => (0, i.toLong, cv.toSeq) } ++
      cb2.toSeq.zipWithIndex.map { case (cv, i) => (1, i.toLong, cv.toSeq) })
      .toDF("half", "idx", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/_quantizer")
    writeMarker(s, out, ImiCoding)
  }

  /** [[search]] over a [[buildImi]] index: probe cells resolve against
    * the SIDECAR half codebooks (parquet doubles round-trip bit-exactly),
    * the ADC LUT and scoring tail are the raw-mode ones shared with every
    * other index family. Default nProbe keeps q46e's probed FRACTION
    * (cells/16 — the 4-of-64 gate dial); read the serving dial off a
    * recall curve for YOUR corpus before production, exactly as the auto
    * arm's scaladoc prescribes. */
  def searchImi(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = -1): DataFrame = {
    checkMarkerIs(s, indexDir, ImiCoding)
    val sidecar = s.read.parquet(s"$indexDir/_quantizer").collect()
    def half(h: Int): Array[Array[Double]] = sidecar
      .filter(_.getAs[Int]("half") == h)
      .sortBy(_.getAs[Long]("idx"))
      .map(_.getSeq[Double](2).toArray)
    val (cb1, cb2) = (half(0), half(1))
    require(cb1.nonEmpty && cb1.length == cb2.length,
      s"corrupt _quantizer sidecar: halves ${cb1.length}/${cb2.length}")
    val kk = cb1.length
    val probe = if (nProbe > 0) nProbe else math.max(1, kk * kk / 16)
    // multi-sequence frontier probes (Babenko & Lempitsky §3.1): the
    // serving path never enumerates the K² grid — spec-pinned identical
    // cell sets to the grid ranking
    val probeRows = SimilarityOps
      .imiFrontierProbes(s, sfDir, probe, kk, cb1, cb2)
      .select(col("q_id"), col("list_id"), col("qv"))
      .collect()
    if (probeRows.isEmpty) return emptyResult(s)
    val probes = probeRows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lutRows = lutRowsOf(probeRows, residual = false)
    val probedLists = probes.map(_._2).distinct.sorted
    val codes = s.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists: _*))
    adcTopK(s, codes, probes, lutRows, k)
  }

  /** Marker value for OPQ-residual indexes (q70e's coding carried to
    * the serving side): codes quantize R·(v − c(v)) against the
    * rotated-space books, so a raw or plain-residual search against
    * them would rank against the wrong reconstruction — loud in both
    * directions, the `_coding` contract. */
  private val OpqCoding = "opq-residual"

  /** The persisted index under q70e's OPQ-RESIDUAL coding: same 16
    * frozen coarse lists, same 4-byte codes, same partitionBy(list_id)
    * layout and pruning as [[build]] — the only difference is WHAT the
    * codes quantize (SimilarityOps.codedSubsOpqRes, THE shared seam the
    * in-query q70e codes through, so persisted and recomputed codes are
    * identical by construction). */
  def buildOpq(s: SparkSession, sfDir: String, out: String): Unit = {
    val emb = graft.Tables.embeddings(s, sfDir)
      .filter(col("vec_id") >= SimilarityOps.QueryIdMax)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    aggCodes(SimilarityOps.codedSubsOpqRes(s, graft.Tables.spreadScan(s, emb)))
      .repartition(col("list_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id").parquet(out)
    writeMarker(s, out, OpqCoding)
  }

  /** [[search]] over a [[buildOpq]] index: probe resolution is THE
    * shared resolver (the coarse quantizer is untouched by the
    * rotation), the ADC LUT rotates each query's PER-LIST residual
    * through the frozen OpqResidualModel driver-side — the same matvec
    * fold and subtraction order as the in-query kernel chain, so cells
    * are bit-identical to knnIvfPqOpq's (spec-pinned). */
  def searchOpq(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = SimilarityOps.IvfProbesServing): DataFrame = {
    checkMarkerIs(s, indexDir, OpqCoding)
    val probeRows = SimilarityOps.queryProbeLists(s, sfDir, nProbe)
      .select(col("q_id"), col("list_id"), col("qv"))
      .collect()
    if (probeRows.isEmpty) return emptyResult(s)
    val probes = probeRows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lutRows = lutRowsOpq(probeRows)
    val probedLists = probes.map(_._2).distinct.sorted
    val codes = s.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists: _*))
    adcTopK(s, codes, probes, lutRows, k)
  }

  /** [[lutRowsOf]] under the OPQ-residual coding: per probe row, the
    * per-list residual q − c_list (q70c's subtraction order) is rotated
    * by ONE [[graft.operators.Opq.matvec]] — the identical left fold the
    * rotate kernel runs — then cells accumulate against the rotated-
    * space books in the same (x−y)² left fold as every other LUT. */
  private def lutRowsOpq(probeRows: Array[org.apache.spark.sql.Row])
      : Seq[(Long, Long, Long, Long, Double)] = {
    val books = graft.operators.OpqResidualModel.books
    val rot = graft.operators.OpqResidualModel.rotation
    require(rot.nonEmpty && books.nonEmpty,
      "OpqResidualModel not frozen — run TrainQuantizers --opq-res and paste")
    // (q − c_list) then ONE matvec — the identical fold chain the
    // rotate kernel runs in-query
    lutRowsVia(probeRows, books,
      (lid, v) => graft.operators.Opq.matvec(rot, residualOf(lid, v)))
  }

  /** The code table committed through SnapshotLake (list_id-clustered,
    * long stats on list_id): atomic publish, time travel, manifest-level
    * probe pruning. Returns the published version. */
  def buildVersioned(s: SparkSession, sfDir: String, table: String,
      residual: Boolean = false): Long =
    SnapshotLake.commitOverwrite(s, table,
      codedTable(s, sfDir, residual).repartition(col("list_id")).sortWithinPartitions("list_id"),
      statsCol = Some("list_id"),
      props = Map(CodingProp -> codingName(residual)))

  /** Incremental maintenance: code a batch of NEW vectors — (vec_id,
    * embedding) rows, e.g. a day's arrivals — through the same shared
    * kernel and APPEND them as one atomic snapshot. The index grows by
    * a version per batch instead of rebuilding; the appended files are
    * list_id-clustered with their own stats, so probe pruning keeps
    * skipping at file granularity across the append history.
    *
    * Query-convention rows (vec_id < [[SimilarityOps.QueryIdMax]]) are
    * excluded HERE, exactly as the batch build excludes them inside
    * codedCorpusSubs — so appending a raw embeddings table cannot index
    * the query vectors as corpus (which would make every search return
    * its own query at distance 0 and break the spec-pinned bit-identity
    * with knnIvfPq). Already-indexed ids are excluded too (see
    * [[newIdsOnly]]); a batch the guard empties out publishes NOTHING —
    * the current latest version returns unchanged and a warning names
    * the no-op, so a retry neither burns a version slot nor plants an
    * empty scan-always file in every future manifest. To UPDATE a
    * vector: deleteVersioned → compactVersioned → append (the guard
    * makes in-place re-appends explicit no-ops, never silent
    * half-updates). */
  def appendVersioned(s: SparkSession, newVectors: DataFrame, table: String,
      residual: Boolean = false): Long = {
    // appending raw codes into a residual table (or vice versa) corrupts
    // ranks exactly like a cross-coded search — validate BEFORE coding
    if (SnapshotLake.latestVersionOf(s, table).nonEmpty)
      checkVersionedCoding(s, table, None, residual)
    val fresh = newIdsOnly(s, newVectors, table)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (fresh.isEmpty) {
        log.warn(s"appendVersioned($table): every batch id already indexed — no-op")
        SnapshotLake.latestVersionOf(s, table)
          .getOrElse(sys.error(s"appendVersioned: empty batch on empty table $table"))
      } else
        // requireProps closes the check-then-commit race: the pre-check
        // above fails fast with the guard's rich message, and the commit
        // itself re-validates against the version it actually rebases
        // onto — an opposite-coding rebuild landing in between aborts
        // the append instead of stamping a mixed-coding snapshot
        SnapshotLake.commitAppend(s, table, codedBatch(s, fresh, residual),
          statsCol = Some("list_id"),
          props = Map(CodingProp -> codingName(residual)),
          requireProps = Map(CodingProp -> codingName(residual)))
    } finally { fresh.unpersist(blocking = false); () }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The RE-INGEST guard both append paths share: drop batch rows whose
    * vec_id is already in the table — code rows OR tombstones. Without
    * it, a re-run append (an operator retrying yesterday's job, or a
    * crash-redelivered micro-batch whose batch-id skip was defeated by
    * an interleaved compact/delete commit) lands a SECOND code row for
    * the id across snapshots, and the ADC tail's per-(q_id, vec_id)
    * conditional sums would silently double that id's distance — rank
    * corruption with no error. Tombstoned ids are dropped for the same
    * reason: re-inserting a deleted id requires [[compactVersioned]]
    * first (the documented delete contract — the guard enforces it
    * instead of surprising). Cost: one column-pruned scan of the index's
    * vec_id column per batch; at 10⁹-id scale swap for a Bloom-filter
    * sidecar. Table existence resolves via the O(1) LATEST pointer, not
    * a log listing. Concurrent appends of the SAME id can still race
    * past the guard (the standard optimistic-commit caveat, as with
    * commitStreamBatch's interleaving note). */
  private def newIdsOnly(s: SparkSession, newVectors: DataFrame, table: String): DataFrame =
    if (SnapshotLake.latestVersionOf(s, table).isEmpty) newVectors
    else newVectors.join(
      SnapshotLake.read(s, table).select("vec_id"), Seq("vec_id"), "left_anti")

  /** A raw (vec_id, embedding) batch -> committable code rows: the query-
    * convention filter, THE shared assignment kernel, list-clustered
    * layout. Single-sourced so batch appends and the streaming path below
    * cannot drift. */
  private def codedBatch(s: SparkSession, newVectors: DataFrame,
      residual: Boolean = false): DataFrame =
    aggCodes(SimilarityOps.codedSubsOf(s,
      newVectors.filter(col("vec_id") >= SimilarityOps.QueryIdMax)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")), residual))
      .repartition(col("list_id")).sortWithinPartitions("list_id")

  /** Continuous index maintenance: each micro-batch of arriving (vec_id,
    * embedding) rows is coded through the same kernel as a batch append
    * and committed as ONE atomic snapshot per micro-batch. Restart
    * safety is TWO stacked mechanisms: [[SnapshotLake.commitStreamBatch]]
    * skips a crash-redelivered batch whose id is on the latest manifest
    * (the fast path), and [[newIdsOnly]] drops already-indexed ids even
    * when an interleaved compact/delete commit replaced that manifest in
    * the crash window — so a redelivered batch can never double-index.
    * Searches see each batch atomically: a snapshot either contains ALL
    * of a micro-batch's codes or none. */
  def appendStream(stream: DataFrame, table: String, checkpoint: String,
      residual: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fresh = newIdsOnly(s, batch, table)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // a batch the guard empties (full redelivery, or an empty
          // source micro-batch) publishes nothing — no version burn, no
          // empty scan-always file accreting into every manifest
          if (!fresh.isEmpty) {
            if (SnapshotLake.latestVersionOf(s, table).nonEmpty)
              checkVersionedCoding(s, table, None, residual)
            SnapshotLake.commitStreamBatch(s, table, codedBatch(s, fresh, residual), batchId,
              statsCol = Some("list_id"),
              props = Map(CodingProp -> codingName(residual)),
              requireProps = Map(CodingProp -> codingName(residual)))
          }
        } finally { fresh.unpersist(blocking = false); () }
        ()
      }
      .start()

  /** Reserved tombstone partition id. Probed lists are always >= 0, so
    * the probe IN-filter can never read tombstones as codes; search reads
    * probed lists + this one in a SINGLE readRangeIn (one version
    * resolution — a search can never see codes from one snapshot and
    * deletes from another). */
  private[graft] val TombstoneListId = -1L

  /** Merge-on-read DELETE — the missing third of the index lifecycle
    * (dedup and decontamination emit REMOVAL lists; a corpus that only
    * grows serves deleted vectors forever): append the ids as tombstone
    * rows in the reserved partition, O(batch) work regardless of index
    * size — the deletion-bitmap/live-docs design, deferring the physical
    * rewrite to [[compactVersioned]]. A tombstone hides every occurrence
    * of the id (even codes appended AFTER it, across any version); to
    * re-insert a deleted id, compact first — the fold drops the tombstone
    * together with the rows it masks. `ids` is a 1-column (vec_id) frame:
    * removal lists arrive as DataFrames, never driver arrays. */
  def deleteVersioned(s: SparkSession, ids: DataFrame, table: String): Long =
    SnapshotLake.commitAppend(s, table,
      ids.select(col("vec_id").cast("long").as("vec_id"))
        .withColumn("list_id", lit(TombstoneListId))
        .withColumn("codes", lit(null).cast("array<bigint>")),
      statsCol = Some("list_id"))

  /** Fold tombstones physically: ONE reader-safe rewrite
    * ([[SnapshotLake.commitRewrite]]) of the current snapshot without the
    * masked rows or the tombstones themselves, re-clustered by list_id.
    * Returns None (retry on fresh state) if a foreign commit raced in —
    * never drops a raced append. Pinned readers of older versions still
    * see the pre-compaction files (time travel is unaffected). */
  def compactVersioned(s: SparkSession, table: String): Option[Long] =
    SnapshotLake.commitRewrite(s, table, { rows =>
      val tomb = rows.filter(col("list_id") === TombstoneListId).select("vec_id")
      rows.filter(col("list_id") =!= TombstoneListId)
        .join(tomb, Seq("vec_id"), "left_anti")
        .repartition(col("list_id")).sortWithinPartitions("list_id")
    }, statsCol = Some("list_id"))

  /** Driver-side probe resolution + ADC lookup table, shared by both
    * serving paths. ONE bounded job: nQueries x nProbe rows, each
    * carrying its query vector — sized by the query batch, not the
    * corpus. LUT cells are keyed (q_id, list_id, sub, code): for raw
    * coding the cell is ||qsv - codebook(sub, code)||² (identical across
    * a query's probed lists — the key is just wider than it needs to
    * be); for residual coding the query side is its PER-LIST residual
    * (q - c_list) first, exactly q70c's zip_with subtraction, so the
    * list_id key is load-bearing. Every cell accumulates in the same
    * left fold over (x-y)*(x-y) doubles as the Catalyst
    * `aggregate(zip_with(...), 0D, acc + z)` chain, so cells are
    * bit-identical to the in-query computation (spec-pinned for both
    * codings). */
  private def probeAndLut(s: SparkSession, sfDir: String, nProbe: Int,
      residual: Boolean, cents: DataFrame = null)
      : (Seq[(Long, Long)], Seq[(Long, Long, Long, Long, Double)]) = {
    // auto-k indexes are raw-only (their residual books don't exist);
    // the marker check upstream makes this unreachable, but the LUT's
    // IvfCentroids lookup below would silently mis-rank, so belt+braces
    require(!(residual && cents != null),
      "residual LUT against a custom quantizer: no trained residual books")
    // THE shared probe resolver (SimilarityOps.queryProbeLists — also
    // what q70b runs in-query), collected driver-side
    val probeRows = SimilarityOps.queryProbeLists(s, sfDir, nProbe, cents = cents)
      .select(col("q_id"), col("list_id"), col("qv"))
      .collect()
    (probeRows.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      lutRowsOf(probeRows, residual))
  }

  /** The ADC lookup table from collected (q_id, list_id, qv) probe rows —
    * ONE construction shared by the frozen/auto resolver and the IMI
    * resolver, so the subtraction order (and with it the q70 bit
    * identity) cannot drift between index families. */
  private def lutRowsOf(probeRows: Array[org.apache.spark.sql.Row],
      residual: Boolean): Seq[(Long, Long, Long, Long, Double)] =
    lutRowsVia(probeRows,
      if (residual) PqResidualCodebooks.values else PqCodebooks.values,
      // residual: (q - c_list) — the same IEEE subtraction, same order,
      // as q70c's zip_with(qv, cv, x - y); raw: the query vector itself
      if (residual) residualOf _ else (_, v: Seq[Double]) => v.toArray)

  /** Per-list residual q − c_list in ascending-index order — the exact
    * element order q70c's zip_with replays. */
  private def residualOf(lid: Long, v: Seq[Double]): Array[Double] = {
    val c = IvfCentroids.values(lid.toInt)
    val out = new Array[Double](v.length)
    var i = 0
    while (i < out.length) { out(i) = v(i) - c(i); i += 1 }
    out
  }

  /** THE one LUT construction (raw / residual / OPQ-residual index
    * families all come through here — the subtraction order, and with it
    * the q70 bit identity, cannot drift between them): per probe row the
    * query side passes through `xform` ONCE, then every (sub, code) cell
    * accumulates in the same (x−y)² left fold as the Catalyst
    * `aggregate(zip_with(...))` chain. */
  private def lutRowsVia(probeRows: Array[org.apache.spark.sql.Row],
      books: Array[Array[Array[Double]]],
      xform: (Long, Seq[Double]) => Array[Double]): Seq[(Long, Long, Long, Long, Double)] = {
    for {
      r <- probeRows.toSeq
      qid = r.getLong(0)
      lid = r.getLong(1)
      qv = xform(lid, r.getSeq[Double](2))
      sub <- 0 until NSub
      (cv, code) <- books(sub).zipWithIndex.toSeq
    } yield {
      var acc = 0.0
      var i = 0
      while (i < SubDim) {
        val x = qv(sub * SubDim + i) - cv(i)
        acc += x * x
        i += 1
      }
      (qid, lid, sub.toLong, code.toLong, acc)
    }
  }

  /** ADC top-k over a (vec_id, list_id, codes) frame: 8 lookup-adds per
    * candidate against the broadcast LUT, then THE shared scoring tail
    * ([[SimilarityOps.adcRank]] — the same conditional-sum order, reduce
    * chain and tie-break q70/q70b rank through, so the spec-pinned
    * bit-identity cannot drift on an edit to one copy). */
  private def adcTopK(s: SparkSession, codes: DataFrame,
      probes: Seq[(Long, Long)], lutRows: Seq[(Long, Long, Long, Long, Double)],
      k: Int): DataFrame = {
    import s.implicits._
    val lut = lutRows.toDF("q_id", "list_id", "sub_idx", "code", "dsub")
    val probePairs = probes.toDF("q_id", "list_id")
    val candidates = codes
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"),
        posexplode(col("codes")).as(Seq("sub_idx", "code")))
      .join(broadcast(probePairs), Seq("list_id"))
      .join(broadcast(lut), Seq("q_id", "list_id", "sub_idx", "code"))
    SimilarityOps.adcRank(candidates, k)
  }

  private def emptyResult(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, Double, Long)].toDF("q_id", "neighbor_id", "adc_dist", "rank")
  }

  /** ADC top-k over the prebuilt index; bit-identical to
    * SimilarityOps.knnIvfPq (raw) / knnIvfPqResidual (residual) at the
    * SAME nProbe on the same corpus + frozen constants (spec-pinned at
    * both the serving default and q70b's oracle constant). The default
    * nProbe is the q68c-curve SERVING operating point
    * ([[SimilarityOps.IvfProbesServing]] — >=0.9 of the brute-force
    * ceiling on the gate corpus), NOT q70b's oracle-pinned 2: defaults
    * are what operators actually run, and the recompute queries keep
    * their own pinned value explicitly. `residual` must match the
    * build's flag — enforced via the index's `_coding` marker. */
  def search(s: SparkSession, indexDir: String, sfDir: String,
      k: Int = 3, nProbe: Int = SimilarityOps.IvfProbesServing,
      residual: Boolean = false): DataFrame = {
    checkCodingMarker(s, indexDir, residual)
    val (probes, lutRows) = probeAndLut(s, sfDir, nProbe, residual)
    if (probes.isEmpty) return emptyResult(s)
    val probedLists = probes.map(_._2).distinct.sorted
    // the pruned scan: list_id is a partition column, the IN-list a
    // literal — only probed directories are ever listed or opened
    val codes = s.read.parquet(indexDir)
      .filter(col("list_id").isin(probedLists: _*))
    adcTopK(s, codes, probes, lutRows, k)
  }

  /** [[search]] over a [[buildVersioned]] table: ONE manifest-pruned
    * [[SnapshotLake.readRangeIn]] over the probed lists PLUS the
    * tombstone partition (single manifest read, single version
    * resolution — K per-list reads with version=None could each resolve
    * a different latest under a concurrent rebuild, or see codes from
    * one snapshot and deletes from another, and stitch a cross-version
    * result no snapshot ever contained), optionally pinned to a version.
    * Tombstoned ids ([[deleteVersioned]]) drop by anti-join before
    * scoring — the planner broadcasts the (small) tombstone side on its
    * own statistics; no unbounded hint. */
  def searchVersioned(s: SparkSession, table: String, sfDir: String,
      k: Int = 3, nProbe: Int = SimilarityOps.IvfProbesServing,
      version: Option[Long] = None, residual: Boolean = false): DataFrame = {
    // resolve the version ONCE so the coding check and the data read see
    // the same snapshot (version=None checked then read could straddle a
    // concurrent rebuild), then validate the snapshot's coding property
    val pinned = version.orElse(SnapshotLake.latestVersionOf(s, table))
    require(pinned.nonEmpty, s"no snapshots at $table")
    checkVersionedCoding(s, table, pinned, residual)
    val (probes, lutRows) = probeAndLut(s, sfDir, nProbe, residual)
    if (probes.isEmpty) return emptyResult(s)
    val rows = SnapshotLake.readRangeIn(s, table, "list_id",
      probes.map(_._2).distinct.sorted :+ TombstoneListId, pinned)
    val tomb = rows.filter(col("list_id") === TombstoneListId).select("vec_id")
    val codes = rows.filter(col("list_id") =!= TombstoneListId)
      .join(tomb, Seq("vec_id"), "left_anti")
    adcTopK(s, codes, probes, lutRows, k)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && !args.take(2).exists(_.startsWith("--")),
      "usage: AnnIndexBuild <sf-dir> <index-out-dir> [--search] [--residual]")
    val residual = args.contains("--residual")
    val spark = GraftSession.get()
    val t0 = System.nanoTime()
    build(spark, args(0), args(1), residual)
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"job":"ann_index_build","build_sec":$buildSec%.3f,""" +
      f""""coding":"${codingName(residual)}"}""")
    if (args.contains("--search")) {
      // timed amortization check: the serving read path over the
      // prebuilt index vs q70b's recompute-everything query. Two runs:
      // the first pays codegen/JIT, the second is the steady state a
      // serving loop sees.
      val times = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        val n = search(spark, args(1), args(0), residual = residual).count()
        ((System.nanoTime() - t1) / 1e9, n)
      }
      println(f"""{"job":"ann_index_search","rows":${times.last._2},""" +
        f""""cold_sec":${times.head._1}%.3f,"warm_sec":${times.last._1}%.3f}""")
    }
    spark.stop()
  }
}
