package graft.jobs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** Snapshot-isolated lake table: a minimal transaction log over plain
  * parquet (the Iceberg/Delta idea reduced to its load-bearing core).
  *
  * Layout:
  * {{{
  *   <table>/data/<commit-uuid>/part-*.parquet   immutable once published
  *   <table>/_log/v%08d.manifest                 one relative path per line
  * }}}
  *
  * A snapshot IS its manifest: readers resolve the latest version through
  * the `_log/LATEST` pointer (+ forward existence probes; full listing
  * only as a fallback — O(1) per read instead of O(commits)), pick a
  * version, and
  * scan exactly the files it names — never the directory tree — so writers
  * can stage new data files freely (a half-written commit is invisible
  * until its manifest publishes) and maintenance can rewrite files without
  * readers ever seeing a half-swapped state. Publishing is one
  * atomic rename onto `v{N+1}`: rename-to-existing fails, so the version
  * number is a claim — on a lost race the writer re-reads the new latest,
  * rebases its file list, and retries (optimistic concurrency, bounded).
  * Contrast [[LakeLayout.compact]], which rewrites directories in place
  * and therefore demands a single-writer maintenance window; here
  * [[commitCompacted]] is just another commit racing like any other.
  *
  * Scale notes: the manifest grows with file count, not rows — at 100 TB
  * with right-sized files that is ~1e5 lines of text, read once per query
  * plan on the driver; data-file I/O is unchanged parquet scanning with
  * full pushdown/pruning. Time travel = reading an older manifest.
  * [[expire]] bounds log growth: it drops old manifests and deletes data
  * files no retained snapshot references.
  */
object SnapshotLake {

  private val MaxCommitAttempts = 20

  private def fsOf(spark: SparkSession, table: String): (FileSystem, Path) = {
    val root = new Path(table)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def logDir(root: Path) = new Path(root, "_log")

  private def manifestPath(root: Path, v: Long) =
    new Path(logDir(root), f"v$v%08d.manifest")

  private def claimPath(root: Path, v: Long) =
    new Path(logDir(root), f"v$v%08d.claim")

  private def listLog(fs: FileSystem, root: Path, suffix: String): Seq[Long] = {
    val dir = logDir(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(suffix) =>
        n.stripPrefix("v").stripSuffix(suffix).toLong }
      .sorted.toSeq
  }

  /** Published versions, ascending (empty for a fresh/absent table).
    * Lists the log directory — O(total versions); the hot read path never
    * calls this (see [[latestVersion]]), so full listings are paid only by
    * genuine history walks (time-travel UIs, [[expire]]). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, table)
    listLog(fs, root, ".manifest")
  }

  /** O(1) latest-version lookup (LATEST pointer + forward probes; None
    * when the table has no snapshot yet). Hot paths needing "does this
    * table exist / what's current" should call THIS, not [[versions]] —
    * the full log listing is O(commits) and exists for audit/expiry. */
  def latestVersionOf(spark: SparkSession, table: String): Option[Long] = {
    val (fs, root) = fsOf(spark, table)
    latestVersion(fs, root)
  }

  private def latestPointerPath(root: Path) = new Path(logDir(root), "LATEST")

  /** Bounded latest-version discovery: the `_log/LATEST` pointer names a
    * FLOOR, then forward existence probes catch manifests published after
    * the pointer was last bumped. The pointer is a HINT — written
    * best-effort after each publish, possibly stale (a racing writer's
    * overwrite can even regress it), never trusted as an upper bound —
    * so correctness never depends on it: probes walk forward from any
    * floor, and a missing/corrupt/dangling pointer falls back to the full
    * directory listing (legacy tables, torn writes). Happy-path cost: one
    * pointer read + lag+1 existence probes, vs an O(100k-entry) listing
    * per query plan on a long-lived table. */
  private[jobs] def latestVersion(fs: FileSystem, root: Path): Option[Long] =
    latestVersionInstrumented(fs, root)._1

  /** Test seam: (latest, existence probes paid, fell back to listing). */
  private[graft] def latestVersionInstrumented(
      fs: FileSystem, root: Path): (Option[Long], Int, Boolean) = {
    val hint: Option[Long] =
      try {
        val in = fs.open(latestPointerPath(root))
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        s.toLongOption
      } catch { case _: java.io.IOException => None }
    hint.filter(_ >= 1) match {
      case Some(h) if fs.exists(manifestPath(root, h)) =>
        var v = h
        var probes = 1
        while ({ probes += 1; fs.exists(manifestPath(root, v + 1)) }) v += 1
        (Some(v), probes, false)
      case dangling => // absent/corrupt/unpublished pointer: list instead
        (listLog(fs, root, ".manifest").lastOption,
          if (dangling.isDefined) 1 else 0, true)
    }
  }

  /** Best-effort post-publish pointer bump. Failures are swallowed and
    * racing writers may interleave overwrites out of order: the pointer is
    * a read-path floor with probe/listing recovery, never part of the
    * commit protocol's correctness. */
  private def updateLatestPointer(fs: FileSystem, root: Path, v: Long): Unit =
    try {
      val out = fs.create(latestPointerPath(root), true)
      try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    } catch { case _: java.io.IOException => () }

  /** What the manifest's per-file min/max values ARE: long decimal strings
    * compared numerically, or the RAW BYTES of the parquet binary stats,
    * hex-encoded on the manifest line and compared in unsigned byte order
    * (the order parquet uses for BINARY/UTF8 stats and Spark's UTF8String
    * uses for string comparisons — so prune tests, file stats, and the
    * residual filter all agree). Raw bytes, NOT a decoded String: parquet
    * may truncate binary stats mid-codepoint, and a String round-trip
    * would map the dangling prefix to U+FFFD — which can move a bound in
    * the UNSAFE direction and prune files holding matching rows. Byte
    * truncation keeps min a valid lower bound and max a valid upper bound. */
  private[jobs] sealed trait StatsKind
  private[jobs] object StatsKind {
    case object Longs extends StatsKind
    case object Strings extends StatsKind
  }
  private[jobs] case class StatsSpec(col: String, kind: StatsKind)

  /** Unsigned byte-lexicographic compare — parquet binary-stats order and
    * Spark UTF8String order (Java String.compareTo would NOT match: UTF-16
    * code-unit order diverges from byte order above the BMP). */
  private def bytesCompare(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val HexDigits = "0123456789abcdef".toCharArray
  private def toHex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = HexDigits((b(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexDigits(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }
  private def fromHex(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(i * 2, i * 2 + 2), 16).toByte
      i += 1
    }
    out
  }

  /** A manifest data line: a relative file path, optionally with the
    * commit-time min/max of the table's stats column — decimal digits for
    * Longs, hex for Strings; both alphabets are separator-safe, so no
    * further escaping is needed. */
  private[jobs] case class FileEntry(path: String, min: Option[String], max: Option[String]) {
    def line: String = min.zip(max)
      .map { case (lo, hi) => s"$path\t$lo\t$hi" }.getOrElse(path)
  }

  // limit = -1: a trailing empty field (legal for an empty-string bound)
  // must not be DROPPED — the default split would then misparse the whole
  // line, tabs and all, as a path
  private def parseEntry(l: String): FileEntry = l.split("\t", -1) match {
    case Array(p, lo, hi) => FileEntry(p, Some(lo), Some(hi))
    case _                => FileEntry(l, None, None)
  }

  private val statsHeader = "#stats="
  private val statsKindHeader = "#statskind=" // absent = long (the original format)
  private val batchHeader = "#batchid="
  private val propHeader = "#prop:" // "#prop:key=value" — per-version table properties

  /** Encode caller-supplied table properties as manifest headers. Keys and
    * values live on one manifest line each, so newlines are structurally
    * impossible and '=' may not appear in the key (it delimits). */
  private def propHeaders(props: Map[String, String]): Seq[String] = {
    props.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('=') && !k.contains('\n') && !v.contains('\n'),
        s"table property key/value must be newline-free and the key '='-free: '$k' -> '$v'")
    }
    props.toSeq.sortBy(_._1).map { case (k, v) => s"$propHeader$k=$v" }
  }

  private def parseProps(headers: Seq[String]): Map[String, String] =
    headers.collect {
      case h if h.startsWith(propHeader) =>
        val kv = h.stripPrefix(propHeader)
        val i = kv.indexOf('=')
        kv.take(i) -> kv.drop(i + 1)
    }.toMap

  /** The table properties of a snapshot (`version = None` -> latest):
    * commit-time key/value metadata carried in the manifest — what the
    * table's bytes MEAN (e.g. the ANN index's PQ coding). Properties
    * persist across commits: [[publish]] carries the base snapshot's
    * properties forward unless the new commit overrides the same key, so
    * compaction/rewrite/append can never silently strip them. */
  def propsOf(spark: SparkSession, table: String, version: Option[Long] = None): Map[String, String] = {
    val (fs, root) = fsOf(spark, table)
    val v = version.getOrElse(latestVersion(fs, root)
      .getOrElse(sys.error(s"no snapshots at $table")))
    version.foreach(v => require(fs.exists(manifestPath(root, v)), s"version $v not published at $table"))
    parseProps(readManifestRaw(fs, root, v)._1)
  }

  private def specOf(headers: Seq[String]): Option[StatsSpec] = {
    val col = headers.collectFirst { case h if h.startsWith(statsHeader) => h.stripPrefix(statsHeader) }
    val kind =
      if (headers.contains(statsKindHeader + "string")) StatsKind.Strings else StatsKind.Longs
    col.map(StatsSpec(_, kind))
  }

  /** (stats spec, file entries) of a manifest. */
  private def readManifest(fs: FileSystem, root: Path, v: Long): (Option[StatsSpec], Seq[FileEntry]) = {
    val (headers, entries) = readManifestRaw(fs, root, v)
    (specOf(headers), entries)
  }

  private def statsHeaders(spec: Option[StatsSpec]): Seq[String] =
    spec.toSeq.flatMap { s =>
      Seq(statsHeader + s.col) ++
        (if (s.kind == StatsKind.Strings) Seq(statsKindHeader + "string") else Nil)
    }

  private def readManifestRaw(fs: FileSystem, root: Path, v: Long): (Seq[String], Seq[FileEntry]) = {
    val in = fs.open(manifestPath(root, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
      finally in.close()
    (lines.filter(_.startsWith("#")), lines.filterNot(_.startsWith("#")).map(parseEntry))
  }

  /** Snapshot read. `version = None` -> latest. Fails on an absent table
    * or version — an empty table is representable (empty manifest), an
    * absent one is a caller bug.
    *
    * `mergeSchema = true` unions the schemas of every file in the
    * snapshot (columns added by later commits read as null in older
    * files) — schema evolution costs one footer read per file at PLAN
    * time, so leave it off for tables with a fixed schema.
    */
  def read(spark: SparkSession, table: String, version: Option[Long] = None,
           mergeSchema: Boolean = false): DataFrame =
    readEntries(spark, table, version, identity, mergeSchema)

  /** Snapshot read with MANIFEST-LEVEL file pruning: scan only the files
    * whose commit-time [min, max] of the stats column overlaps [lo, hi],
    * then apply the exact range predicate. Planning-time skipping from
    * driver-side metadata — no footer reads, no file opens for files the
    * manifest already rules out; with a clustered layout (sort or Z-order
    * before commit, so per-file ranges are narrow) a needle query opens
    * O(1) files of a 100 TB table. Falls back to a plain filtered read
    * when the snapshot carries no stats for `statsCol`.
    */
  def readRange(spark: SparkSession, table: String, statsCol: String,
                lo: Long, hi: Long, version: Option[Long] = None): DataFrame =
    readRangeImpl(spark, table, StatsSpec(statsCol, StatsKind.Longs), version,
      (mn, mx) => mn.toLong <= hi && lo <= mx.toLong,
      df => {
        import org.apache.spark.sql.functions.{col => c}
        df.filter(c(statsCol) >= lo && c(statsCol) <= hi)
      })

  /** [[readRange]] for a SET of values (an IN-list probe): ONE manifest
    * read and ONE version resolution for the whole set — a file is kept
    * when its [min, max] contains ANY of the values. The single
    * resolution is a consistency property, not just a cost saving: K
    * per-value readRange calls with version=None could each resolve a
    * DIFFERENT latest version under a concurrent commit and stitch a
    * cross-version result no snapshot ever contained. */
  def readRangeIn(spark: SparkSession, table: String, statsCol: String,
                  values: Seq[Long], version: Option[Long] = None,
                  rowFilter: Boolean = true): DataFrame = {
    require(values.nonEmpty, "readRangeIn: empty value set")
    readRangeImpl(spark, table, StatsSpec(statsCol, StatsKind.Longs), version,
      (mn, mx) => {
        val lo = mn.toLong; val hi = mx.toLong
        values.exists(v => lo <= v && v <= hi)
      },
      df => {
        // rowFilter=false returns every row of the pruned FILES — the
        // superset a caller with its own exact join downstream wants:
        // rows from stat-less (pre-upgrade) files carry a NULL stats
        // column that isin() would silently drop
        import org.apache.spark.sql.functions.{col => c}
        if (rowFilter) df.filter(c(statsCol).isin(values: _*)) else df
      })
  }

  /** [[readRange]] for a STRING stats column (ISO dates, camera ids,
    * partition-style values): prune files by the manifest's raw-byte
    * min/max in unsigned byte order — the same order parquet computed the
    * stats in and the same order Spark's string `>=`/`<=` filter uses, so
    * the prune can never drop a matching row (even off stats parquet
    * truncated mid-codepoint). */
  def readRangeString(spark: SparkSession, table: String, statsCol: String,
                      lo: String, hi: String, version: Option[Long] = None): DataFrame = {
    val loB = lo.getBytes(StandardCharsets.UTF_8)
    val hiB = hi.getBytes(StandardCharsets.UTF_8)
    readRangeImpl(spark, table, StatsSpec(statsCol, StatsKind.Strings), version,
      (mn, mx) => bytesCompare(fromHex(mn), hiB) <= 0 && bytesCompare(loB, fromHex(mx)) <= 0,
      df => {
        import org.apache.spark.sql.functions.{col => c, lit}
        df.filter(c(statsCol) >= lit(lo) && c(statsCol) <= lit(hi))
      })
  }

  private def readRangeImpl(spark: SparkSession, table: String, want: StatsSpec,
                            version: Option[Long],
                            overlaps: (String, String) => Boolean,
                            exact: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (fs, root) = fsOf(spark, table)
    val v = resolveVersion(spark, table, version)
    val (spec, all) = readManifest(fs, root, v)
    val kept =
      if (spec.contains(want))
        all.filter(e => (e.min, e.max) match {
          case (Some(mn), Some(mx)) => overlaps(mn, mx)
          case _                    => true // no stats for this file: must scan
        })
      else all
    def paths(es: Seq[FileEntry]) = es.map(e => new Path(root, e.path).toString)
    if (all.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Nil))
    else if (kept.isEmpty) // everything pruned: keep the schema, scan nothing
      spark.read.parquet(paths(all).head).filter(lit(false))
    else
      exact(spark.read.parquet(paths(kept): _*))
  }

  /** O(1) per read: latest resolves via the pointer + forward probes, an
    * explicit version via one existence check — never a full log listing. */
  private def resolveVersion(spark: SparkSession, table: String, version: Option[Long]): Long = {
    val (fs, root) = fsOf(spark, table)
    version match {
      case Some(v) =>
        require(fs.exists(manifestPath(root, v)), s"version $v not published at $table")
        v
      case None =>
        val latest = latestVersion(fs, root)
        require(latest.nonEmpty, s"no snapshots at $table")
        latest.get
    }
  }

  private def readEntries(spark: SparkSession, table: String, version: Option[Long],
                          select: Seq[FileEntry] => Seq[FileEntry],
                          mergeSchema: Boolean = false): DataFrame = {
    val (fs, root) = fsOf(spark, table)
    val v = resolveVersion(spark, table, version)
    val files = select(readManifest(fs, root, v)._2).map(e => new Path(root, e.path).toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Nil))
    else spark.read.option("mergeSchema", mergeSchema.toString).parquet(files: _*)
  }

  /** Commit-time file stats from the parquet FOOTER (metadata only — no
    * data pages read): the min/max of a long OR string column across the
    * file's row groups. None when any row group lacks usable stats (the
    * file then always scans — safe, never wrong). Parquet may TRUNCATE
    * long binary min/max — truncation rounds min down and max up, so a
    * truncated bound is still a valid bound for overlap pruning.
    */
  private def footerRange(conf: org.apache.hadoop.conf.Configuration,
                          file: Path, col: String): Option[(String, String, StatsKind)] = {
    import scala.jdk.CollectionConverters._
    val md = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, file, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val perBlock = md.getBlocks.asScala.map { b =>
      b.getColumns.asScala.find(_.getPath.toDotString == col).flatMap { cc =>
        val st = cc.getStatistics
        if (st == null || !st.hasNonNullValue) None
        else (st.genericGetMin, st.genericGetMax) match {
          case (mn: java.lang.Long, mx: java.lang.Long) =>
            Some((mn.toString, mx.toString, StatsKind.Longs: StatsKind))
          case (mn: org.apache.parquet.io.api.Binary, mx: org.apache.parquet.io.api.Binary) =>
            // RAW bytes hex-encoded — never decoded to String (see StatsKind)
            Some((toHex(mn.getBytes), toHex(mx.getBytes), StatsKind.Strings: StatsKind))
          case _ => None
        }
      }
    }
    if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
    else {
      val all = perBlock.flatten
      val byteOrd: Ordering[String] = Ordering.fromLessThan(
        (a, b) => bytesCompare(fromHex(a), fromHex(b)) < 0)
      all.map(_._3).distinct.toList match {
        case List(StatsKind.Longs) =>
          Some((all.map(_._1.toLong).min.toString, all.map(_._2.toLong).max.toString, StatsKind.Longs))
        case List(StatsKind.Strings) =>
          Some((all.map(_._1).min(byteOrd), all.map(_._2).max(byteOrd), StatsKind.Strings))
        case _ => None // mixed physical types across row groups: no stats
      }
    }
  }

  /** Stage `df` as an immutable data directory; return the staged dir (so
    * a failed publish can clean it up — an unreferenced dir is otherwise
    * invisible to expire(), which only sweeps empty data dirs), its new
    * manifest entries (unpublished until a manifest names them), and the
    * stats spec actually realized (column + kind inferred from the parquet
    * footers when a stats column is declared). */
  private def stage(spark: SparkSession, fs: FileSystem, root: Path, df: DataFrame,
                    statsCol: Option[String]): (Path, Seq[FileEntry], Option[StatsSpec]) = {
    val commitId = UUID.randomUUID().toString
    val dataDir = new Path(new Path(root, "data"), commitId)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = fs.listStatus(dataDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName).toSeq
    val ranges = files.map(f => statsCol.flatMap(c => footerRange(conf, f.getPath, c)))
    val kind = ranges.flatten.map(_._3).headOption // first file with stats decides
    val entries = files.zip(ranges).map { case (f, r) =>
      val ok = r.filter(t => kind.contains(t._3)) // odd-kind file: scan-always
      FileEntry(s"data/$commitId/${f.getPath.getName}", ok.map(_._1), ok.map(_._2))
    }
    (dataDir, entries, statsCol.flatMap(c => kind.map(StatsSpec(c, _))))
  }

  /** Best-effort removal of a staged-but-never-published data directory. */
  private def deleteStagedQuietly(fs: FileSystem, dataDir: Path): Unit =
    try { fs.delete(dataDir, true); () } catch { case _: java.io.IOException => () }

  /** Publish the next version after rebasing on the observed latest via
    * `merge(baseStatsCol, baseEntries)`. The version number is claimed with
    * `create(vN.claim, overwrite = false)` — atomic fail-on-existing on
    * HDFS AND local filesystems, unlike rename, which on POSIX silently
    * REPLACES an existing destination (two racing renames would both
    * "succeed" and one commit would vanish). Only the claim holder writes
    * vN.manifest, so the manifest rename is never contested. A pending
    * claim newer than the newest manifest means another writer is
    * mid-commit: we wait for its manifest rather than rebase past it (that
    * would publish a newer version omitting its rows); a claimant that
    * DIED mid-commit leaves a stale claim that fails commits loudly until
    * [[recoverAbandonedClaims]] removes it — fail-loud beats silent data
    * loss. Returns the published version. */
  /** Schemes whose `FileSystem.create(path, overwrite = false)` is NOT an
    * atomic create-exclusive: the object-store connectors implement it as
    * an exists() probe followed by a PUT, so two racing writers can both
    * "win" the same claim and one commit's manifest silently clobbers the
    * other. Same failure mode Delta's LogStore contract exists for. */
  private val NonAtomicClaimSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "swift", "cosn")

  /** Enforce the filesystem contract commits depend on: the claim file
    * must be creatable atomically-iff-absent. file:// (O_EXCL) and
    * HDFS-like stores qualify; raw object stores do not — front them with
    * a coordination layer (HDFS log dir, a DynamoDB/ZK-style LogStore)
    * before pointing SnapshotLake at them.
    *
    * Checked twice: on the raw table URI (cheap, catches explicit
    * `s3a://...` paths even when the connector jars are absent), and on
    * the RESOLVED FileSystem (catches a scheme-less path on a cluster
    * whose fs.defaultFS is an object store — the raw URI has no scheme
    * there, but the claim would still land on the unsafe store). */
  private def requireAtomicClaims(table: String): Unit =
    rejectScheme(Option(new Path(table).toUri.getScheme))

  private def requireAtomicClaims(fs: FileSystem): Unit =
    rejectScheme(Option(fs.getUri).flatMap(u => Option(u.getScheme)))

  private def rejectScheme(scheme: Option[String]): Unit = {
    val s = scheme.getOrElse("file").toLowerCase
    require(!NonAtomicClaimSchemes.contains(s),
      s"SnapshotLake commit on '$s://' is unsafe: the scheme's create(overwrite=false) " +
        "is exists-check-then-PUT, not atomic, so racing writers could both claim the same " +
        "version and silently lose a commit. Use HDFS/file URIs for the table, or an " +
        "object store fronted by an atomic-create coordination layer.")
  }

  /** Atomically create `path` iff absent. Hadoop's LocalFileSystem
    * `create(path, overwrite = false)` is an exists() CHECK followed by a
    * plain open — not exclusive — so on file:// URIs the claim uses
    * `File.createNewFile` (O_CREAT|O_EXCL per its contract) instead. Non-
    * local schemes rely on the store's atomic create — [[requireAtomicClaims]]
    * rejects the schemes known to fake it. */
  private def createExclusive(fs: FileSystem, path: Path): Boolean = {
    val uri = path.toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      new java.io.File(uri.getPath).createNewFile()
    else
      try { fs.create(path, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Wall-clock budget to wait on another writer's pending claim before
    * failing (override via -Dgraft.snapshot.pendingWaitMs, e.g. in tests). */
  private def pendingWaitMs: Long =
    sys.props.get("graft.snapshot.pendingWaitMs").map(_.toLong).getOrElse(60000L)

  /** Thrown by a merge closure to abandon the commit without publishing
    * anything (e.g. a compaction that observed a foreign commit racing in
    * — publishing the rebased base verbatim would burn a version slot on a
    * no-op). Raised BEFORE the claim is taken, so nothing needs undoing. */
  private final class CommitAbandoned extends RuntimeException(null, null, false, false)

  private def publish(fs: FileSystem, root: Path,
                      merge: (Option[StatsSpec], Seq[FileEntry]) => (Option[StatsSpec], Seq[FileEntry]),
                      extraHeaders: Seq[String] = Nil,
                      requireBaseProps: Map[String, String] = Map.empty): Long = {
    fs.mkdirs(logDir(root))
    var attempt = 0
    var waitedMs = 0L
    while (attempt < MaxCommitAttempts) {
      val manifests = listLog(fs, root, ".manifest")
      val latest = if (manifests.isEmpty) 0L else manifests.max
      if (listLog(fs, root, ".claim").exists(_ > latest)) {
        // another writer is between claim and manifest: wait on a wall-
        // clock budget (not the attempt counter — a healthy writer on a
        // slow store may hold its claim for seconds)
        if (waitedMs >= pendingWaitMs)
          throw new IllegalStateException(
            s"snapshot commit at $root blocked > ${pendingWaitMs} ms by a pending claim — " +
              "a crashed writer's stale .claim needs recoverAbandonedClaims")
        Thread.sleep(50); waitedMs += 50
      } else {
        attempt += 1
        val target = latest + 1
        val (baseHeaders, base) =
          if (latest == 0L) (Seq.empty[String], Seq.empty[FileEntry])
          else readManifestRaw(fs, root, latest)
        // validated INSIDE the claim loop, against the version this
        // attempt actually rebases onto: a pre-commit check outside the
        // loop is check-then-act — a foreign commit (e.g. an opposite-
        // coding index rebuild) landing between check and publish would
        // silently produce a snapshot violating the caller's invariant
        requireBaseProps.foreach { case (k, want) =>
          parseProps(baseHeaders).get(k).foreach { have =>
            if (have != want) throw new IllegalStateException(
              s"commit at $root requires base property $k=$want but the " +
                s"current latest (v$latest) carries $k=$have — the table " +
                "changed under this writer; re-validate and retry")
          }
        }
        val (outSpec, manifest) = merge(specOf(baseHeaders), base)
        // table properties survive every commit kind (append, overwrite,
        // rewrite, compaction, stream batch): carry the base snapshot's
        // #prop: headers forward, new values for the same key override
        val overridden = parseProps(extraHeaders).keySet
        val carried = propHeaders(parseProps(baseHeaders) -- overridden)
        val lines = statsHeaders(outSpec) ++ carried ++ extraHeaders ++ manifest.map(_.line)
        if (createExclusive(fs, claimPath(root, target))) {
          // claim won. Claim files are PERMANENT once their manifest
          // publishes: deleting them would re-open the version slot for a
          // writer still holding a pre-claim listing, whose rename would
          // silently replace the manifest on POSIX. expire() drops them
          // with their versions.
          val tmp = new Path(logDir(root), s"_tmp-${UUID.randomUUID()}")
          try {
            val out = fs.create(tmp, false)
            try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
            finally out.close()
            require(fs.rename(tmp, manifestPath(root, target)),
              s"manifest rename failed for claimed version $target at $root")
          } catch {
            case e: Throwable =>
              // failed AFTER claiming: release the slot so the table is
              // not wedged until recoverAbandonedClaims (stale claims are
              // for writers that DIED, not ones that can clean up)
              fs.delete(tmp, false)
              fs.delete(claimPath(root, target), false)
              throw e
          }
          updateLatestPointer(fs, root, target)
          return target
        }
        // lost the claim race: loop re-lists and either waits on the
        // winner's pending manifest or targets the next version
      }
    }
    throw new IllegalStateException(
      s"snapshot commit at $root lost $MaxCommitAttempts claim races — writer storm?")
  }

  /** Remove claim files left by writers that died between claiming a
    * version and publishing its manifest (their data was never visible, so
    * dropping the claim is safe). Only claims older than `olderThanMs` are
    * touched — a live writer's in-flight claim is seconds old. Returns the
    * versions unblocked. */
  def recoverAbandonedClaims(spark: SparkSession, table: String,
                             olderThanMs: Long = 600000L): Seq[Long] = {
    val (fs, root) = fsOf(spark, table)
    val manifests = listLog(fs, root, ".manifest").toSet
    val now = System.currentTimeMillis()
    listLog(fs, root, ".claim").filterNot(manifests).filter { v =>
      try {
        val st = fs.getFileStatus(claimPath(root, v))
        now - st.getModificationTime >= olderThanMs &&
          { fs.delete(claimPath(root, v), false); true }
      } catch {
        // the claim's writer finished (or another recovery ran) between
        // the listing and the stat — nothing to recover
        case _: java.io.FileNotFoundException => false
      }
    }
  }

  /** Append commit: new snapshot = observed latest files + df's files.
    * The snapshot keeps its stats column only while every commit declares
    * the same one (same column AND same value kind) — otherwise pruning
    * silently disables (never wrong).
    *
    * Filesystem contract (all commit methods): the table URI's scheme must
    * provide atomic create-iff-absent for the claim file — file:// and
    * HDFS-like stores do; raw object-store schemes (s3a, gs, abfs, …) are
    * rejected up front because their non-atomic create would let racing
    * writers silently lose commits. */
  /** Merged stats spec of a commit: keep the base spec when the fresh
    * files agree on it, AND when the fresh files simply carry no stats at
    * all under the SAME declared column (an empty micro-batch or a batch
    * whose footers lack stats must not permanently disable pruning for the
    * whole table — its entries just scan-always). Anything genuinely
    * conflicting (different column, different value kind, or no column
    * declared) drops the spec: pruning disables, never lies. */
  private def mergedSpec(baseSpec: Option[StatsSpec], base: Seq[FileEntry],
                         freshSpec: Option[StatsSpec], declared: Option[String]): Option[StatsSpec] =
    if (base.isEmpty && baseSpec.isEmpty) freshSpec
    else if (baseSpec == freshSpec) freshSpec
    else if (freshSpec.isEmpty && declared.exists(c => baseSpec.exists(_.col == c))) baseSpec
    else None

  /** `requireProps`: base-snapshot property values this commit insists
    * on — checked against the version each publish attempt REBASES onto
    * (not just the one the caller looked at), so an invariant like an
    * index's coding cannot be broken by a commit racing in between. A
    * base that lacks the key passes (first commit, legacy table). */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
                   statsCol: Option[String] = None,
                   props: Map[String, String] = Map.empty,
                   requireProps: Map[String, String] = Map.empty): Long = {
    requireAtomicClaims(table)
    val (fs, root) = fsOf(spark, table)
    requireAtomicClaims(fs)
    val (dataDir, fresh, freshSpec) = stage(spark, fs, root, df, statsCol)
    try
      publish(fs, root, { (baseSpec, base) =>
        (mergedSpec(baseSpec, base, freshSpec, statsCol), base ++ fresh)
      }, extraHeaders = propHeaders(props), requireBaseProps = requireProps)
    catch { case e: Throwable => deleteStagedQuietly(fs, dataDir); throw e }
  }

  /** Overwrite commit: new snapshot = df's files only. Old files stay on
    * disk for time travel until [[expire]] drops the versions naming them.
    * Filesystem contract: see [[commitAppend]]. */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame,
                      statsCol: Option[String] = None,
                      props: Map[String, String] = Map.empty): Long = {
    requireAtomicClaims(table)
    val (fs, root) = fsOf(spark, table)
    requireAtomicClaims(fs)
    val (dataDir, fresh, freshSpec) = stage(spark, fs, root, df, statsCol)
    try publish(fs, root, (_, _) => (freshSpec, fresh), extraHeaders = propHeaders(props))
    catch { case e: Throwable => deleteStagedQuietly(fs, dataDir); throw e }
  }

  /** Reader-safe compaction: rewrite the CURRENT snapshot into
    * ceil(bytes/target) files and commit the rewrite as an overwrite.
    * Readers of any published version are untouched — their manifests
    * still name the old files. If another commit lands between the read
    * and the publish, the rebase closure rejects the compaction (returns
    * None) rather than silently dropping that commit's rows.
    */
  def commitCompacted(spark: SparkSession, table: String,
                      targetFileBytes: Long = 128L << 20): Option[Long] =
    commitCompacted(spark, table, targetFileBytes, () => ())

  /** Test seam: `beforePublish` runs between staging the rewrite and
    * publishing it — the window a foreign commit can race into. */
  private[graft] def commitCompacted(spark: SparkSession, table: String,
                                     targetFileBytes: Long,
                                     beforePublish: () => Unit): Option[Long] = {
    requireAtomicClaims(table)
    val (fs, root) = fsOf(spark, table)
    requireAtomicClaims(fs)
    val latest = latestVersion(fs, root)
    require(latest.nonEmpty, s"no snapshots at $table")
    val (_, baseFiles) = readManifest(fs, root, latest.get)
    if (baseFiles.isEmpty) return None
    // file-count heuristic from the observed snapshot; if a commit races
    // between here and the rewrite's own base read, nOut is merely stale
    // (the rewrite itself still abandons on any raced base)
    val bytes = baseFiles.map(f => fs.getFileStatus(new Path(root, f.path)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    commitRewrite(spark, table, _.coalesce(nOut), None, beforePublish)
  }

  /** Reader-safe ROW-LEVEL rewrite: commit transform(current snapshot) as
    * an overwrite of that SAME snapshot — the generalization of
    * [[commitCompacted]] (which rewrites file layout, not rows) that
    * tombstone folds, column drops, or re-clustering need. If any foreign
    * commit lands between the base read and the publish, the rewrite
    * ABANDONS (None) rather than silently dropping the raced commit's
    * rows — the caller retries on fresh state; an overwrite here would
    * lose data. Readers of published versions are untouched (their
    * manifests still name the old files). `statsCol` defaults to the base
    * snapshot's stats column so a rewrite preserves pruning. */
  def commitRewrite(spark: SparkSession, table: String,
                    transform: DataFrame => DataFrame,
                    statsCol: Option[String] = None): Option[Long] =
    commitRewrite(spark, table, transform, statsCol, () => ())

  private[graft] def commitRewrite(spark: SparkSession, table: String,
                                   transform: DataFrame => DataFrame,
                                   statsCol: Option[String],
                                   beforePublish: () => Unit): Option[Long] = {
    requireAtomicClaims(table)
    val (fs, root) = fsOf(spark, table)
    requireAtomicClaims(fs)
    val latest = latestVersion(fs, root)
    require(latest.nonEmpty, s"no snapshots at $table")
    val basedOn = latest.get
    val (baseStats, baseFiles) = readManifest(fs, root, basedOn)
    val rewritten = transform(read(spark, table, Some(basedOn)))
    val declared = statsCol.orElse(baseStats.map(_.col))
    val (dataDir, fresh, freshSpec) = stage(spark, fs, root, rewritten, declared)
    // a rewrite whose output carries no footer stats (e.g. rewritten to
    // EMPTY by a full-turnover tombstone fold) must not permanently drop
    // the table's stats spec: a later append would then merge against a
    // spec-less base and mergedSpec would disable pruning for good. Safe
    // to keep the base/declared spec — freshSpec=None implies stage()
    // recorded NO min/max on any fresh entry (kind undecided), so every
    // fresh file scans-always and a preserved spec can never wrongly
    // prune them.
    val outSpec = freshSpec.orElse(baseStats.filter(b => declared.contains(b.col)))
    beforePublish()
    try
      Some(publish(fs, root, { (_, base) =>
        // a commit raced in: abandon — publishing would either drop its
        // rows (data loss) or burn a version slot on stale output
        if (base.map(_.path) != baseFiles.map(_.path)) throw new CommitAbandoned
        (outSpec, fresh)
      }))
    catch {
      case _: CommitAbandoned => deleteStagedQuietly(fs, dataDir); None
      case e: Throwable       => deleteStagedQuietly(fs, dataDir); throw e
    }
  }

  /** Streaming-batch append with retry idempotence: the committed version
    * records its micro-batch id, and a re-delivered batch (foreachBatch
    * re-runs the last batch after a crash) sees its own id on the latest
    * version and skips. Covers the restart-retry failure mode; interleaved
    * foreign commits between the failure and the retry are the standard
    * foreachBatch caveat and out of scope. */
  def commitStreamBatch(spark: SparkSession, table: String, df: DataFrame,
                        batchId: Long, statsCol: Option[String] = None,
                        props: Map[String, String] = Map.empty,
                        requireProps: Map[String, String] = Map.empty): Long = {
    requireAtomicClaims(table)
    val (fs, root) = fsOf(spark, table)
    requireAtomicClaims(fs)
    latestVersion(fs, root).foreach { latest =>
      val (headers, _) = readManifestRaw(fs, root, latest)
      if (headers.contains(batchHeader + batchId)) return latest // re-delivery
    }
    val (dataDir, fresh, freshSpec) = stage(spark, fs, root, df, statsCol)
    try
      publish(fs, root, { (baseSpec, base) =>
        (mergedSpec(baseSpec, base, freshSpec, statsCol), base ++ fresh)
      }, extraHeaders = Seq(batchHeader + batchId) ++ propHeaders(props),
        requireBaseProps = requireProps)
    catch { case e: Throwable => deleteStagedQuietly(fs, dataDir); throw e }
  }

  /** Continuous ingest into the versioned table: one snapshot commit per
    * micro-batch via foreachBatch + [[commitStreamBatch]] — readers get
    * snapshot isolation and time travel over a live stream. */
  def appendStream(df: DataFrame, table: String, checkpoint: String,
                   statsCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitStreamBatch(batch.sparkSession, table, batch, id, statsCol); ()
      }
      .start()

  /** Drop all but the last `keepLast` versions and delete every data file
    * no retained manifest references. Returns (#versions dropped,
    * #data files deleted). Retention contract: readers must pin versions
    * newer than the expire horizon.
    */
  def expire(spark: SparkSession, table: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must retain at least one version")
    val (fs, root) = fsOf(spark, table)
    val vs = versions(spark, table)
    val drop = vs.dropRight(keepLast)
    val keep = vs.takeRight(keepLast)
    val referenced = keep.flatMap(readManifest(fs, root, _)._2.map(_.path)).toSet
    val doomed = drop.flatMap(readManifest(fs, root, _)._2.map(_.path)).distinct
      .filterNot(referenced)
    doomed.foreach(f => fs.delete(new Path(root, f), false))
    // sweep now-empty data directories
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).foreach { d =>
        if (d.isDirectory && fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, false)
      }
    drop.foreach { v =>
      fs.delete(manifestPath(root, v), false)
      fs.delete(claimPath(root, v), false) // claims are permanent until expiry
    }
    (drop.size, doomed.size)
  }
}
