package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class RuleSpec extends SparkSpecBase {

  private def naturalQuery(cutoff: String) =
    Tables.events(spark, sf)
      .filter(col("ts") > lit(cutoff).cast("timestamp"))
      .select(col("event_id"), col("user_id"))

  test("PushRawEpochFilter: natural ts predicate reaches the parquet scan") {
    GraftExtensions.install(spark)
    val p = naturalQuery("2024-01-25 00:00:00").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"rule did not push the rewritten raw predicate:\n$p")
  }

  test("PushRawEpochFilter: rewritten results identical to unoptimized (all comparators)") {
    // results with the rule installed must match a session-independent
    // recomputation done on the raw column by hand
    GraftExtensions.install(spark)
    val cutUs = java.time.Instant.parse("2024-01-25T00:00:00Z").getEpochSecond * 1000000L
    val raw = Tables.eventsRaw(spark, sf)
    def handCount(op: String): Long = op match {
      case ">"  => raw.filter(expr(s"ts div 1000 > $cutUs")).count()
      case ">=" => raw.filter(expr(s"ts div 1000 >= $cutUs")).count()
      case "<"  => raw.filter(expr(s"ts div 1000 < $cutUs")).count()
      case "<=" => raw.filter(expr(s"ts div 1000 <= $cutUs")).count()
    }
    val ts = lit("2024-01-25 00:00:00").cast("timestamp")
    val e = Tables.events(spark, sf)
    assert(e.filter(col("ts") > ts).count() === handCount(">"))
    assert(e.filter(col("ts") >= ts).count() === handCount(">="))
    assert(e.filter(col("ts") < ts).count() === handCount("<"))
    assert(e.filter(col("ts") <= ts).count() === handCount("<="))
    // and the four partition the table with the boundary handled once
    assert(e.filter(col("ts") > ts).count() + e.filter(col("ts") <= ts).count() === raw.count())
  }

  test("PushRawEpochFilter: mixed conjuncts — only the ts comparison moves below") {
    GraftExtensions.install(spark)
    val df = Tables.events(spark, sf)
      .filter(col("ts") > lit("2024-01-25 00:00:00").cast("timestamp") &&
              col("event_type") === "click")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    // (scan metadata strings truncate at 100 chars, so assert the predicate
    // survived somewhere in the plan rather than inside PushedFilters)
    assert(p.contains("event_type"), p)
    // correctness against a hand-built equivalent
    val cutNs = java.time.Instant.parse("2024-01-25T00:00:00Z").getEpochSecond * 1000000000L
    val expected = Tables.eventsRaw(spark, sf)
      .filter(col("ts") > lit(cutNs) && col("event_type") === "click").count()
    assert(df.count() === expected)
  }
}
