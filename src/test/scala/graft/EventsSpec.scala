package graft

import graft.ops.EventsOps
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpecBase {

  test("events loader: ns → timestamp conversion is order-preserving and lossless to micros") {
    val e = Tables.events(spark, sf)
    val n = e.count()
    assert(n > 0)
    // conversion must preserve distinct-ordering vs the raw nanos column
    val raw = spark.read.parquet(s"$sf/events.parquet").selectExpr("ts as ts_ns")
    assert(raw.select(countDistinct(expr("ts_ns div 1000"))).head.getLong(0) ===
      e.select(countDistinct(unix_micros(col("ts")))).head.getLong(0))
  }

  test("watermarkScan: strictly-greater semantics") {
    val wmMs = java.sql.Timestamp.valueOf("2024-01-25 00:00:00").getTime
    val out = EventsOps.watermarkScan(spark, sf)
    assert(out.filter(col("ts_ms") <= wmMs).count() === 0)
    val total = Tables.events(spark, sf).count()
    val below = Tables.events(spark, sf).filter(unix_millis(col("ts")) <= wmMs).count()
    assert(out.count() === total - below)
  }

  test("eventsHourly: partitions all events; n_users bounded by n_events") {
    val out = EventsOps.eventsHourly(spark, sf)
    assert(out.select(sum("n_events")).head.getLong(0) === Tables.events(spark, sf).count())
    assert(out.filter(col("n_users") > col("n_events")).count() === 0)
  }

  test("windowLag: exactly one gap=-1 per user; gaps non-negative otherwise") {
    val out = EventsOps.windowLag(spark, sf)
    val users = Tables.events(spark, sf).select(countDistinct("user_id")).head.getLong(0)
    assert(out.filter(col("gap_ms") === -1).count() === users)
    assert(out.filter(col("gap_ms") < -1).count() === 0)
  }

  test("jsonExtract: per-type counts cover the table") {
    val out = EventsOps.jsonExtract(spark, sf)
    assert(out.select(sum("n")).head.getLong(0) === Tables.events(spark, sf).count())
  }
}
