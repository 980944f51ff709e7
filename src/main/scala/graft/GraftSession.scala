package graft

import org.apache.spark.sql.SparkSession

/** Single place for performance-relevant session configuration.
  *
  * Tuned for local[32] testing but designed for cluster scale: AQE handles
  * runtime re-planning (skew joins, partition coalescing), broadcast
  * threshold covers the dimension tables, and shuffle partitions default to
  * the core count (overridden by the cluster at real scale).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter pruning: a selective filter on one join side
      // injects a bloom filter into the other side's scan — at 100 TB this
      // is the difference between shuffling a full fact table and shuffling
      // the ~1% that can actually match; explicit so no Spark-version
      // default change can silently disable it
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // scan-split sizing for the core count: the default 128 MB cuts a
      // ~700 MB single-file table (events at the sf10 audit scale) into
      // ~6 splits, so every pre-shuffle map stage (filters, per-row
      // expressions feeding the first groupBy/window exchange) runs on 6
      // of 32 cores (measured: q23 at CPU/wall 1.5). 32 MB keeps map
      // stages core-saturated at audit scale and is a no-op on the small
      // SFs; a real cluster sizes this against ITS executor count.
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // The lake has shipped events.ts both as TIMESTAMP(NANOS) and as
      // timestamp[us]. This conf only affects nanos-typed files: it reads
      // them as an epoch-nanos long instead of rejecting them in the
      // vectorized reader. The engine-wide long-nanos `ts` convention is
      // enforced schema-adaptively in Tables.normalizeTs, which also maps
      // µs-typed timestamps to unix_micros*1000.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // DetectAmbiguousSelfJoin false-positives on rollup-after-join plans
      // (the Expand duplicates grouping attributes); no self-joins here rely
      // on dataset-id disambiguation, so the check is safe to disable.
      .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      .config("spark.ui.enabled", "false")

  /** [[builder]] plus `SPARK_GRAFT_EXTRA_CONF` overrides — `k=v;k=v` pairs
    * applied LAST, so a deployment (or an A/B audit) can re-dial any
    * session conf without a code edit: the scale-dependent knobs
    * (shuffle width, split size, AQE thresholds) are cluster-sized in
    * production while the committed defaults keep the local bench
    * comparable across rounds. Restricted to `spark.*` keys so a typo'd
    * pair fails loudly instead of silently configuring nothing. */
  def builderWithEnv(master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = builder(master, shufflePartitions)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foreach { pair =>
        val i = pair.indexOf('=')
        require(i > 0 && pair.startsWith("spark."),
          s"SPARK_GRAFT_EXTRA_CONF pair must be spark.<key>=<value>; got '$pair'")
        val key = pair.substring(0, i).trim
        // the env hook is a TUNING seam, not a semantics seam: ANSI mode
        // and the session timezone change what casts/date functions
        // COMPUTE (while e.g. Clf.train's exactAcc kernel keeps non-ANSI
        // Cast semantics compiled in), so an override here would silently
        // break engine↔kernel/oracle bit-parity. Refuse loudly.
        require(!semanticKeys(key),
          s"SPARK_GRAFT_EXTRA_CONF may not override semantics-relevant conf '$key'")
        // every applied override is logged so a bench artifact records
        // what it actually ran with (before/after comparability)
        System.err.println(s"graft: SPARK_GRAFT_EXTRA_CONF override: $pair")
        b.config(key, pair.substring(i + 1).trim)
      }
    b
  }

  /** Confs that change query SEMANTICS rather than execution shape —
    * rejected by [[builderWithEnv]] (see the parity rationale there). */
  private val semanticKeys = Set(
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.parquet.int96RebaseModeInRead",
    "spark.sql.parquet.datetimeRebaseModeInRead")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
