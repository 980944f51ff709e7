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
  * A snapshot IS its manifest: readers list `_log`, pick a version, and
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

  /** Published versions, ascending (empty for a fresh/absent table). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, table)
    val dir = logDir(root)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted.toSeq
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Seq[String] = {
    val in = fs.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Snapshot read. `version = None` -> latest. Fails on an absent table
    * or version — an empty table is representable (empty manifest), an
    * absent one is a caller bug.
    */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val (fs, root) = fsOf(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")} at $table")
    val files = readManifest(fs, root, v).map(rel => new Path(root, rel).toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Nil))
    else spark.read.parquet(files: _*)
  }

  /** Stage `df` as an immutable data directory; return its new relative
    * parquet paths (unpublished until a manifest names them). */
  private def stage(spark: SparkSession, fs: FileSystem, root: Path, df: DataFrame): Seq[String] = {
    val commitId = UUID.randomUUID().toString
    val dataDir = new Path(new Path(root, "data"), commitId)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    fs.listStatus(dataDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => s"data/$commitId/${f.getPath.getName}").sorted.toSeq
  }

  /** Publish `files` as the next version after rebasing on the observed
    * latest via `merge(latestFiles)`. Optimistic: a lost rename race
    * re-reads and retries. Returns the published version. */
  private def publish(fs: FileSystem, root: Path,
                      merge: Seq[String] => Seq[String]): Long = {
    fs.mkdirs(logDir(root))
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      attempt += 1
      val vs = fs.listStatus(logDir(root)).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong }
      val latest = if (vs.isEmpty) 0L else vs.max
      val base = if (latest == 0L) Nil else readManifest(fs, root, latest)
      val manifest = merge(base)
      val tmp = new Path(logDir(root), s"_tmp-${UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write((manifest.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, manifestPath(root, latest + 1))) return latest + 1
      fs.delete(tmp, false) // lost the race: someone claimed v{latest+1}
    }
    throw new IllegalStateException(
      s"snapshot commit at $root lost $MaxCommitAttempts races — writer storm?")
  }

  /** Append commit: new snapshot = observed latest files + df's files. */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame): Long = {
    val (fs, root) = fsOf(spark, table)
    val fresh = stage(spark, fs, root, df)
    publish(fs, root, base => base ++ fresh)
  }

  /** Overwrite commit: new snapshot = df's files only. Old files stay on
    * disk for time travel until [[expire]] drops the versions naming them. */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame): Long = {
    val (fs, root) = fsOf(spark, table)
    val fresh = stage(spark, fs, root, df)
    publish(fs, root, _ => fresh)
  }

  /** Reader-safe compaction: rewrite the CURRENT snapshot into
    * ceil(bytes/target) files and commit the rewrite as an overwrite.
    * Readers of any published version are untouched — their manifests
    * still name the old files. If another commit lands between the read
    * and the publish, the rebase closure rejects the compaction (returns
    * None) rather than silently dropping that commit's rows.
    */
  def commitCompacted(spark: SparkSession, table: String,
                      targetFileBytes: Long = 128L << 20): Option[Long] = {
    val (fs, root) = fsOf(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no snapshots at $table")
    val basedOn = vs.max
    val baseFiles = readManifest(fs, root, basedOn)
    if (baseFiles.isEmpty) return None
    val bytes = baseFiles.map(f => fs.getFileStatus(new Path(root, f)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val compacted = read(spark, table, Some(basedOn)).coalesce(nOut)
    val fresh = stage(spark, fs, root, compacted)
    var stale = false
    val v = publish(fs, root, { base =>
      stale = base != baseFiles // a commit raced in: keep ITS files, not ours
      if (stale) base else fresh
    })
    if (stale) { fs.delete(new Path(root, fresh.head).getParent, true); None }
    else Some(v)
  }

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
    val referenced = keep.flatMap(readManifest(fs, root, _)).toSet
    val doomed = drop.flatMap(readManifest(fs, root, _)).distinct
      .filterNot(referenced)
    doomed.foreach(f => fs.delete(new Path(root, f), false))
    // sweep now-empty data directories
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).foreach { d =>
        if (d.isDirectory && fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, false)
      }
    drop.foreach(v => fs.delete(manifestPath(root, v), false))
    (drop.size, doomed.size)
  }
}
