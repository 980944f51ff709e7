package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

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

  test("q41: shingle join keys are longs (hash postings), not strings") {
    val p = plan(DedupOps.ngramJaccard(spark, sf))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"))
    // the posting key column `sh` must be bigint in the scan-side projection
    assert(p.contains("sh: bigint") || p.contains("sh#"))
  }

  test("q45: corpus side never shuffles — query set broadcasts") {
    val p = plan(SimilarityOps.knnBruteForce(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
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
}
