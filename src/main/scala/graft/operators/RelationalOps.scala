package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._

/** Relational core (SURVEY.md §2.A).
  *
  * Every operator is a declarative DataFrame plan: filters/projections reach
  * the parquet scan (pushdown + pruning), dimension joins broadcast, and all
  * aggregations are partial (map-side combine). Nothing here collects to the
  * driver, so each operator scales with executors.
  */
object RelationalOps {

  /** q01 — grouped aggregation with exact-decimal measures (TPC-H Q1 shape).
    * One shuffle on the (tiny-cardinality) group key; map-side partials do
    * nearly all the work at scale.
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02 — selective scan: both predicates and the 5-column projection push
    * into the parquet reader (PushedFilters / ReadSchema).
    */
  def filterPushdown(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-07-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** q03 — segment revenue top-N (TPC-H Q3 shape). `customer` is a dimension
    * -> broadcast; the orders⋈lineitem join shuffles on orderkey.
    */
  def joinAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q04 — EXISTS as a left-semi join (no row duplication, no distinct). */
  def existsSemijoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 48).select("l_orderkey")
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** q05 — 5-way star join (TPC-H Q5 shape): all dims broadcast, single
    * shuffle chain on the fact keys; AQE handles skew at scale.
    */
  def multiJoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q06 — single-pass conditional aggregation; only the final 1-row reduce
    * shuffles.
    */
  def scanAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"), count(lit(1)).as("n"))

  /** q07 — rank per customer; window partitions by a high-cardinality key so
    * state per partition stays bounded at scale.
    */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** q08 — running sum / lag per user over event time. The running sum uses
    * the exact-decimal carrier so it is partition-order independent.
    */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        sum(acc(col("value"))).over(w).cast("double").as("running_value"),
        lag(col("value"), 1).over(wl).as("prev_value"))
      .orderBy("event_id")
  }

  /** q09 — hierarchical rollup region -> nation. */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val j = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
    j.rollup("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q09b — cube: full cross-tabulation of order status x priority. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** q08b — sliding event-time window by range: per-user 24h trailing sum,
    * expressed as a RANGE frame over epoch-micros so the frame follows the
    * clock, not row counts.
    */
  def windowRange(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val tsUs = call_function("div", col("ts"), lit(1000L))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-dayUs, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"), col("value"))
      .withColumn("trailing_24h",
        sum(acc(col("value"))).over(w).cast("double"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .drop("value")
      .orderBy("event_id")
  }

  /** q10 — anti join: customers with no orders since 2000. */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    Tables.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q11 — top-k per group (frame-selection-per-camera shape). */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("event_type", "event_id", "user_id", "value", "rn")
      .orderBy("event_type", "rn")
  }

  /** q11b — the same top-3-per-type as q11, via the custom `graft_topk`
    * TYPED IMPERATIVE AGGREGATE instead of a window sort: map-side partial
    * aggregation keeps a bounded k-entry heap per (task, group) and the
    * shuffle carries k rows per partial — nothing ever sorts the full
    * group, so the plan is insensitive to group size (q11's window must
    * sort every row of every group before discarding all but 3). Shares
    * q11's oracle: the (score DESC, id ASC) heap order reproduces
    * ROW_NUMBER's tiebreak exactly.
    */
  def topkPerGroupAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(call_function("graft_topk",
        col("value"), col("event_id"), col("user_id"), lit(3)).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("event_type"),
        col("e.id").as("event_id"),
        col("e.aux").as("user_id"),
        col("e.score").as("value"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy("event_type", "rn")

  /** q12 — exact distinct counts (one shuffle per distinct via expand). */
  def distinctCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"))

  /** q12b — sketch-based distinct (HLL) with its accuracy contract made
    * driver-checkable: the production operator is `approx_count_distinct`
    * (constant memory at any scale); the QUERY also computes the exact
    * counts and emits the ≤5% relative-error VERDICT as booleans. The raw
    * sketch estimates are engine-specific (never hash-comparable across
    * engines), but the exact counts and the error predicate are portable —
    * so the oracle pins rows+schema+hash on (exact, within_5pct), and an
    * HLL kernel drifting past its documented rsd flips a boolean and fails
    * the gate instead of hiding behind a rows-only check.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    def within(approx: Column, exact: Column): Column =
      (abs(approx.cast("double") - exact.cast("double")) <=
        lit(0.05) * exact.cast("double")).as("w")
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_partkey")).as("ap"),
      approx_count_distinct(col("l_orderkey")).as("ao"))
      .select(col("exact_parts"), col("exact_orders"),
        within(col("ap"), col("exact_parts")).as("parts_within_5pct"),
        within(col("ao"), col("exact_orders")).as("orders_within_5pct"))
  }

  /** q13 — conditional pivot: event type -> columns (the reference's
    * DynamoDB label-pivot shape). Single shuffle on user_id.
    */
  def casePivot(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).cast("long").as(s"n_$t")
    e.groupBy("user_id")
      .agg(
        cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
        max(when(col("event_type") === "purchase", col("value"))).as("max_purchase"),
        dsum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("sum_purchase"))
      .orderBy("user_id")
  }

  /** q14 — exact interpolated percentiles per group. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"))
      .orderBy("l_returnflag")

  /** q14b — SKETCHED percentiles with a portable accuracy verdict (the
    * q12b device): approx_percentile's GK-style sketch is the percentile
    * a 100 TB scan can actually afford (bounded memory, one pass,
    * mergeable partials — where exact `percentile` materializes the
    * value multiset per group), but its values are engine-specific, so
    * the output carries the EXACT percentiles plus booleans asserting
    * the sketch landed inside its contracted window. The window is a
    * RANK window, bounded by ORDER STATISTICS — the sketch's guarantee
    * is that its value's rank r satisfies |r − p·n| ≤ ε·n, so the value
    * must lie between sorted[max(1, ⌊(p−ε)·n⌋)] and
    * sorted[min(n, ⌈(p+ε)·n⌉)]. (The earlier interpolated-percentile
    * bounds were WRONG in principle: interpolation between adjacent
    * order statistics can land strictly inside the value gap the rank
    * contract permits, yielding a spurious FALSE on small or
    * all-distinct groups.) The order statistics come from a BOUNDED
    * (value, count) aggregation — l_quantity has ~50 distinct values, so
    * the per-group verdict state is O(distinct), not O(rows) (an earlier
    * sort_array(collect_list(...)) form buffered the whole multiset per
    * group: ~20M elements per group at sf10, heading for the 2 GB
    * single-value limit at 100 TB). sorted[r] over (value, count) pairs
    * is "the smallest value whose cumulative count reaches r" — a fold
    * over the ≤|distinct|-element array. The oracle recomputes the exact
    * values and pins the verdicts TRUE; the sketch values themselves
    * never leave the query.
    */
  def approxPercentiles(s: SparkSession, d: String): DataFrame = {
    val acc = 10000
    val eps = 1.0 / acc
    val li = Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
    // Sketch arm: the one-pass bounded-memory aggregation a 100 TB scan
    // actually runs (plus n for the rank window).
    val sketch = li.groupBy("l_returnflag")
      .agg(
        count(col("l_quantity")).as("n"),
        approx_percentile(col("l_quantity"),
          array(lit(0.5), lit(0.9)), lit(acc)).as("ap"))
    // Verdict arm: bounded (value, count) histogram per group — exact
    // percentiles via the frequency-weighted percentile, order
    // statistics via a fold over the sorted histogram.
    val hist = li.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5), col("cnt")).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9), col("cnt")).as("p90_qty"),
        sort_array(collect_list(struct(col("l_quantity").as("v"), col("cnt"))))
          .as("vc"))
    // sorted[r] = first v (ascending) whose running cumulative count >= r.
    def orderStat(vc: Column, r: Column): Column = {
      val z = struct(lit(0L).as("cum"), lit(null).cast("double").as("ans"))
      aggregate(vc, z,
        (st, x) => struct(
          (st("cum") + x("cnt")).as("cum"),
          when(st("ans").isNull && (st("cum") + x("cnt")) >= r,
            x("v").cast("double")).otherwise(st("ans")).as("ans")))("ans")
    }
    def within(i: Int, p: Double) = {
      val loR = greatest(lit(1L), floor(lit(p - eps) * col("n")).cast("long"))
      val hiR = least(col("n"), ceil(lit(p + eps) * col("n")).cast("long"))
      (col("ap")(i).cast("double") >= orderStat(col("vc"), loR) &&
        col("ap")(i).cast("double") <= orderStat(col("vc"), hiR))
    }
    hist.join(sketch, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"),
        within(0, 0.5).as("median_within"),
        within(1, 0.9).as("p90_within"))
      .orderBy("l_returnflag")
  }

  /** q15 — union + exact content-hash dedup across sources (md5 is the
    * portable content key; grouping on it is one shuffle).
    */
  def unionDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val u = docs.filter(col("source") === "src0").select("doc_id", "text")
      .unionAll(docs.filter(col("source") === "src1").select("doc_id", "text"))
      .unionAll(docs.select("doc_id", "text"))
    u.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("text_hash")
  }

  /** q16 — semi-structured extraction: pull a typed field out of the JSON
    * `props` payload and aggregate on it. JSON parsing is per-row map-side
    * work; the only shuffle is the final small aggregation.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** q17 — string predicates and transforms: LIKE / contains filters with
    * projection-level string functions; everything pushes to the scan.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%") || col("p_type").contains("ECO"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** q18 — calendar aggregation: month-truncated order stats (the
    * "recordings per month" shape). */
  def dateTrunc(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("month")

  /** q19 — correlated scalar subquery (TPC-H Q17 shape): lines far below
    * their part's average quantity. Expressed as an aggregate + rejoin so
    * Catalyst plans one shuffle on partkey instead of a per-row subquery.
    */
  def correlatedAvg(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val avgs = l.groupBy(col("l_partkey").as("pk"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    // no broadcast hint: avgs has one row per distinct partkey (unbounded
    // at scale) — let AQE pick broadcast vs shuffle from actual size
    l.join(avgs, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.4)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("avg_qty"))
      .orderBy("l_orderkey", "l_linenumber")
  }
}
