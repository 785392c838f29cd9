package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed physical layout — the shuffle-elimination face of the catalog
  * (SURVEY S2). At 100 TB the fact tables are written once, bucketed on
  * their join/aggregate key; every later equi-join or groupBy on that key
  * then reads co-located buckets and skips the exchange entirely, which is
  * THE dominant cost of the denorm pipelines at scale (each tick of the
  * reference's ETL re-joins fact↔bridge on the same key forever —
  * etl/main.py:24-38 — exactly the amortization bucketing exists for).
  *
  * Verified in ScaleLayoutSpec: the co-located join plan contains zero
  * shuffle exchanges, and results are identical to the plain join.
  */
object BucketedLayout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered in
    * the session catalog. `buckets` should be sized so one bucket of the
    * LARGEST co-bucketed table fits an executor's memory (e.g. 100 TB
    * fact / 8192 buckets ≈ 12 GB splits).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans a SortMergeJoin whose children report
    * HashPartitioning(key, n) straight from the scan — no Exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Date/key-partitioned layout — the other half of the physical story
    * (events by day, orders by month; Tables.scala scale note made real).
    * Partition values become directory keys, so an equality/range filter on
    * the partition column prunes whole directories at PLANNING time: a
    * one-month query over a 100 TB fact touches one directory, not the
    * table. Verified in ScaleLayoutSpec via the scan's PartitionFilters.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
