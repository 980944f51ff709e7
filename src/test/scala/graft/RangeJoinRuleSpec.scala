package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: an interval-overlap theta join must
  * rewrite to a binned equi-join (no nested loop) with row-identical
  * results, including duplicate multiplicity.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private val widthKey = "spark.graft.rangeJoin.binWidth"

  private def withWidth[A](w: Long)(f: => A): A = {
    spark.conf.set(widthKey, w.toString)
    try f finally spark.conf.unset(widthKey)
  }

  /** 200 left intervals and 300 right intervals on a deterministic grid,
    * including exact duplicates (i % 50) so multiplicity is exercised. */
  private def intervals: (DataFrame, DataFrame) = {
    val l = spark.range(200).selectExpr(
      "id AS l_id", "(id % 50) * 100 AS l_start", "(id % 50) * 100 + (id % 7) * 40 AS l_end")
    val r = spark.range(300).selectExpr(
      "id AS r_id", "(id % 60) * 80 + 15 AS r_start", "(id % 60) * 80 + 15 + (id % 11) * 30 AS r_end")
    (l, r)
  }

  private def thetaJoin(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, l("l_start") <= r("r_end") && r("r_start") <= l("l_end"))

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq

  test("rewritten results are row-identical to the nested-loop plan, multi-bin pairs included") {
    val (l, r) = intervals
    val baseline = rows(thetaJoin(l, r)) // width unset: rule dormant
    assert(baseline.nonEmpty)
    // the grid must exercise pairs sharing SEVERAL bins (interval spans up
    // to 240 and 300 vs bin width 100), where a missing first-bin dedup
    // would inflate multiplicity — the sorted multiset compare catches it
    val rewritten = withWidth(100) { rows(thetaJoin(l, r)) }
    assert(rewritten === baseline)
  }

  test("rule fires: no nested loop in the plan, bin equi-keys present") {
    val (l, r) = intervals
    withWidth(100) {
      val p = thetaJoin(l, r).queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("graft_bin"), p)
    }
  }

  test("rule dormant without the width conf") {
    val (l, r) = intervals
    val p = thetaJoin(l, r).queryExecution.executedPlan.toString
    assert(!p.contains("graft_bin"), p)
  }

  test("equi conjuncts ride along: per-key overlap join stays correct") {
    val l = spark.range(400).selectExpr(
      "id % 4 AS key", "id AS l_id", "(id % 30) * 50 AS l_start", "(id % 30) * 50 + 120 AS l_end")
    val r = spark.range(500).selectExpr(
      "id % 4 AS key", "id AS r_id", "(id % 40) * 45 AS r_start", "(id % 40) * 45 + 60 AS r_end")
    def q: DataFrame = l.join(r,
      l("key") === r("key") && l("l_start") <= r("r_end") && r("r_start") <= l("l_end"))
    val baseline = q.select(l("l_id"), r("r_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val (rewritten, plan) = withWidth(120) {
      (q.select(l("l_id"), r("r_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq,
        q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === baseline)
    assert(plan.contains("graft_bin"), plan)
  }

  test("guard: a hand-binned join (q72's shape) is not re-binned when the rule is on") {
    withWidth(1200L * 1000000000L) {
      val p = operators.TemporalOps.overlapJoin(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("graft_bin"), p)
    }
  }

  test("q72b: the driver query sets the width conf and plans as a binned equi-join") {
    val df = operators.TemporalOps.overlapJoinViaRule(spark, sf)
    try {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("graft_bin") && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.unset(widthKey)
  }

  test("strict and mixed bounds rewrite with row-identical parity") {
    val (l, r) = intervals
    // every </<= mix, plus the flipped > spellings — all four must fire
    // AND match their own nested-loop baseline exactly (strict bounds drop
    // the touching-endpoint pairs, so each mix has a DIFFERENT answer)
    val conds = Seq(
      ("lt-lt",   l("l_start") < r("r_end") && r("r_start") < l("l_end")),
      ("lt-le",   l("l_start") < r("r_end") && r("r_start") <= l("l_end")),
      ("le-lt",   l("l_start") <= r("r_end") && r("r_start") < l("l_end")),
      ("gt-flip", r("r_end") > l("l_start") && l("l_end") >= r("r_start")))
    for ((name, cond) <- conds) {
      val q = l.join(r, cond)
      val baseline = rows(q)
      val (rewritten, plan) = withWidth(100) {
        (rows(l.join(r, cond)), l.join(r, cond).queryExecution.executedPlan.toString)
      }
      assert(rewritten === baseline, name)
      assert(plan.contains("graft_bin") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name: $plan")
    }
    // sanity on a touching pair ([0,100] vs [100,200]): <= keeps it, < drops
    // it — and the rewrite agrees on both, so strictness is truly preserved
    import spark.implicits._
    val tl = Seq((1L, 0L, 100L)).toDF("l_id", "l_start", "l_end")
    val tr = Seq((2L, 100L, 200L)).toDF("r_id", "r_start", "r_end")
    withWidth(64) {
      assert(rows(tl.join(tr, tl("l_start") <= tr("r_end") && tr("r_start") <= tl("l_end")))
        === Seq((1L, 2L)))
      assert(rows(tl.join(tr, tl("l_start") < tr("r_end") && tr("r_start") < tl("l_end")))
        === Seq.empty)
    }
  }

  test("a strict dedup guard next to the time bounds must not hijack the bin axis") {
    // the id guard is a valid strict bound conjunct; a naive first-match
    // would bin id-vs-timestamp spans (billions of bins). The rule must
    // pick the unique NON-STRICT pair — and stay row-identical.
    val (l, r) = intervals
    def q = l.join(r,
      l("l_id") < r("r_id") &&
        l("l_start") <= r("r_end") && r("r_start") <= l("l_end"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    val (rewritten, plan) = withWidth(100) {
      (rows(q), q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === baseline)
    assert(plan.contains("graft_bin"), plan) // fired, on the ts axis
  }

  test("a NON-strict dedup guard next to STRICT time bounds must not hijack the bin axis") {
    // the inverse of the test above: here the lone non-strict conjunct is
    // the id guard and the real time bounds are spelled strictly. A
    // non-strict preference applied per-side would pick the id guard as
    // the left axis and the strict time bound as the right — binning an
    // id-vs-timestamp span (a sequence that can exceed the runtime's
    // length limit on a query that ran fine unrewritten). The preference
    // tiers must apply symmetrically, leaving this join un-rewritten.
    val (l, r) = intervals
    def q = l.join(r,
      l("l_id") <= r("r_id") &&
        l("l_start") < r("r_end") && r("r_start") < l("l_end"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    val (rewritten, plan) = withWidth(100) {
      (rows(q), q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === baseline)
    assert(!plan.contains("graft_bin"), plan) // conservatively dormant
  }

  test("timestamp-typed intervals rewrite on the epoch-micros axis") {
    // event-time overlap joins are written on TIMESTAMP columns; the rule
    // bins them on their epoch micros (binWidth read in microseconds) and
    // keeps the original timestamp comparisons as the residual
    val (l0, r0) = intervals
    val l = l0.selectExpr("l_id",
      "timestamp_micros(l_start) AS l_start", "timestamp_micros(l_end) AS l_end")
    val r = r0.selectExpr("r_id",
      "timestamp_micros(r_start) AS r_start", "timestamp_micros(r_end) AS r_end")
    val baseline = rows(thetaJoin(l, r))
    assert(baseline.nonEmpty)
    val (rewritten, plan) = withWidth(100) {
      (rows(thetaJoin(l, r)), thetaJoin(l, r).queryExecution.executedPlan.toString)
    }
    assert(rewritten === baseline)
    assert(plan.contains("graft_bin") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // strictness preserved on the timestamp axis too: touching endpoints
    import spark.implicits._
    val tl = Seq((1L, 0L, 100L)).toDF("l_id", "s", "e")
      .selectExpr("l_id", "timestamp_micros(s) AS l_start", "timestamp_micros(e) AS l_end")
    val tr = Seq((2L, 100L, 200L)).toDF("r_id", "s", "e")
      .selectExpr("r_id", "timestamp_micros(s) AS r_start", "timestamp_micros(e) AS r_end")
    withWidth(64) {
      assert(rows(tl.join(tr, tl("l_start") <= tr("r_end") && tr("r_start") <= tl("l_end")))
        === Seq((1L, 2L)))
      assert(rows(tl.join(tr, tl("l_start") < tr("r_end") && tr("r_start") < tl("l_end")))
        === Seq.empty)
    }
  }

  test("structurally ambiguous bounds (two strict candidates per side) do not rewrite") {
    val (l, r) = intervals
    // both conjunct pairs are strict and bound-shaped; no safe pick exists
    def q = l.join(r,
      l("l_id") < r("r_id") && r("r_id") < l("l_id") + 1000000 &&
        l("l_start") < r("r_end") && r("r_start") < l("l_end"))
    val baseline = rows(q)
    val (rewritten, plan) = withWidth(100) {
      (rows(q), q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === baseline)
    assert(!plan.contains("graft_bin"), plan) // conservatively dormant
  }

  test("randomized intervals: rewritten == baseline across widths and seeds") {
    // deterministic splitmix-style generator (failures reproduce exactly)
    def gen(seed: Long, n: Int, maxLen: Long): Seq[(Long, Long, Long)] = {
      var x = seed
      def next(): Long = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        (z ^ (z >>> 31)) & Long.MaxValue
      }
      (0 until n).map { i =>
        val s = next() % 10000
        (i.toLong, s, s + next() % maxLen)
      }
    }
    import spark.implicits._
    for (seed <- Seq(1L, 7L, 42L); width <- Seq(50L, 300L, 5000L)) {
      val l = gen(seed, 150, 400).toDF("l_id", "l_start", "l_end")
      val r = gen(seed * 31 + 5, 200, 120).toDF("r_id", "r_start", "r_end")
      val baseline = rows(thetaJoin(l, r))
      val rewritten = withWidth(width) { rows(thetaJoin(l, r)) }
      assert(rewritten === baseline, s"seed=$seed width=$width")
    }
  }

  test("q72's own theta-shaped SQL rewrites and matches the explicit binned operator") {
    // sessions x windows as a plain theta join, rule on — must equal the
    // hand-binned TemporalOps.overlapJoin aggregation
    val expected = operators.TemporalOps.overlapJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_windows"))).sorted.toSeq
    val got = withWidth(1200L * 1000000000L) {
      val e = Tables.events(spark, sf)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val sessions = e.filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new", when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > 3600L * 1000000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_seq")
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val wins = e.filter(col("event_type") === "error")
        .select(col("user_id").as("w_user"), col("event_id").as("wid"),
          (col("ts") - 600L * 1000000000L).as("w_start"),
          (col("ts") + 600L * 1000000000L).as("w_end"))
      sessions.join(wins,
          sessions("user_id") === wins("w_user") &&
          sessions("s_start") <= wins("w_end") && wins("w_start") <= sessions("s_end"))
        .groupBy("user_id", "session_seq")
        .agg(countDistinct(col("wid")).as("n_windows"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
          r.getAs[Long]("n_windows"))).sorted.toSeq
    }
    assert(got === expected)
  }
}
