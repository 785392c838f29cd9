package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All loads are plain parquet scans; column pruning and filter pushdown are
  * left to Catalyst (verified in `PlanSpec` via `PushedFilters`/`ReadSchema`).
  *
  * Scale notes (100 TB): these would be partitioned tables (orders/lineitem by
  * date, events by day) registered in a catalog; the loaders isolate that
  * concern so query code never embeds physical layout. Dimension tables
  * (region/nation/supplier/part/customer) stay broadcastable far beyond this
  * test scale — query code marks them with `broadcast()` explicitly.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every operator loads through here, so this is the one chokepoint that
    // guarantees graft's native SQL functions resolve even on a session
    // built WITHOUT spark.sql.extensions=GraftExtensions (library consumers
    // with their own session). Idempotent and warn-free: a registry probe,
    // then an early return when the extensions path already registered them.
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` arrives as parquet timestamp[ns], which Spark 4 refuses to
    * map to TimestampType ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanosecond long (legacy escape hatch) and convert explicitly — integer
    * `div` so no precision is lost on epoch-nano magnitudes (~1.7e18 doesn't
    * fit a double). Session TZ is pinned to UTC everywhere, so the resulting
    * TimestampType column is engine-deterministic.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Raw view: `ts` stays an epoch-nanosecond long. Watermark predicates go
    * HERE — a comparison on the raw bigint pushes down to the parquet scan
    * (row-group pruning), while a predicate on the converted timestamp is an
    * expression over the column and does not. Asserted in PlanSpec.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
}
