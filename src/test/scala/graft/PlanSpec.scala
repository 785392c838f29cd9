package graft

import graft.ops.{EventsOps, RelationalOps}

/** Physical-plan assertions: the properties that make these queries survive a
  * 100× scale-up — filter pushdown, column pruning, broadcast joins, partial
  * top-k — must be visible in the executed plan, not just hoped for.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filterProject: predicate reaches the parquet scan; unused columns pruned") {
    val p = plan(RelationalOps.filterProject(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"),
      s"expected pushed filter on l_returnflag in:\n$p")
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("watermarkScan: raw-nanos watermark predicate is pushed down") {
    val p = plan(EventsOps.watermarkScan(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      s"watermark predicate not pushed to scan:\n$p")
  }

  test("denormDocs: dimension joins broadcast; no shuffle of the fact for dims") {
    val p = plan(RelationalOps.denormDocs(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dim joins in:\n$p")
  }

  test("denormDocs: numeric aggs stay in codegen'd HashAggregate, split from the set side") {
    val p = plan(RelationalOps.denormDocs(spark, sf))
    // the sum/max numeric side must NOT ride in the ObjectHashAggregate —
    // that was the round-1 5x plan gap (whole fact through interpreted
    // set-insert buffers)
    val objAggLines = p.linesIterator.filter(_.contains("ObjectHashAggregate")).toSeq
    assert(objAggLines.nonEmpty, s"expected an object agg for collect_set in:\n$p")
    assert(!objAggLines.exists(l => l.contains("partial_sum") || l.contains("partial_max")),
      s"numeric aggs leaked into ObjectHashAggregate:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("HashAggregate") && !l.contains("Object") && l.contains("partial_sum")),
      s"expected codegen HashAggregate carrying partial_sum in:\n$p")
  }

  test("topkRevenue: partial top-k (TakeOrderedAndProject), not a global sort") {
    val p = plan(RelationalOps.topkRevenue(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected partial top-k in:\n$p")
  }

  test("pricingSummary: partial (map-side) aggregation before the shuffle") {
    val p = plan(RelationalOps.pricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    // partial_ functions appear only when map-side combine is planned
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }
}
