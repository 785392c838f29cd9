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

  /** TRAINING-SHARD export — the last-mile write of a curation pipeline:
    * the kept corpus goes out as `nShards` deterministic, size-bounded,
    * internally-ordered parquet shards plus a manifest a trainer (or the
    * next pipeline) can reconcile against without listing data files.
    *
    * Layout mechanics, each load-bearing at 100 TB:
    *  - `repartitionByRange(nShards, key)` — contiguous key ranges, so a
    *    shard boundary is a key interval (resumable, mergeable, and the
    *    assignment is deterministic for a given dataset, unlike
    *    round-robin/hash whose task scheduling can move rows);
    *  - `sortWithinPartitions(key)` — intra-shard order gives parquet
    *    min/max stats their bite and trainers a stable read order;
    *  - `maxRecordsPerFile` — bounds any one file even if a range is hot
    *    (range skew splits files, never tasks).
    * The manifest (one tiny JSON-lines relation: shard → rows, key span)
    * is derived from the SAME ranged frame in one extra aggregate and
    * written beside the data; ScaleLayoutSpec reconciles it against the
    * files and pins determinism across two writes.
    */
  def exportShards(df: DataFrame, path: String, key: String, nShards: Int,
                   maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions._
    val ranged = df.repartitionByRange(nShards, col(key))
      .sortWithinPartitions(key)
    ranged.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(s"$path/data")
    val manifest = ranged
      .select(spark_partition_id().as("shard"), col(key).cast("string").as("k"))
      .groupBy("shard")
      .agg(count(lit(1)).as("rows"), min("k").as("key_min"), max("k").as("key_max"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/manifest")
  }
}
