package graft.streaming

import graft.ops.SearchOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the postings index — the search-tier face of
  * the reference's whole ETL purpose: Elasticsearch stays queryable because
  * every CDC tick re-indexes the changed documents
  * (/root/reference/etl/main.py:159-177 bulk-indexes per batch). The
  * relational analog: the (token, doc_id, tf) postings relation is a
  * maintained STORE, not a per-query derivation, and each tick merges the
  * dirty documents' recomputed postings into it.
  *
  * Merge rule: drop EVERY posting of a dirty doc_id (a re-written document
  * may have lost tokens — an append-only merge would leave ghosts), then
  * append the recomputed rows. Same anti-join + union + crash-safe
  * [[graft.sinks.AtomicSwap]] staging the document store upsert uses, so
  * delivery is effectively-once: re-processing a batch rewrites the same
  * rows.
  *
  * Scale shape: the anti-join shuffles on doc_id (or broadcasts the dirty
  * set — AQE decides); at warehouse scale the store is token-bucketed and
  * this becomes a MERGE, with searches reading only their terms' buckets.
  * Every search face already takes a postings DataFrame
  * ([[SearchOps.postingsSearch]], [[SearchOps.rankedPostingsSearch]],
  * [[SearchOps.fuzzyIndexedQuery]]) — they run unchanged over the
  * maintained store.
  */
object IncrementalPostings {

  /** Recompute postings for the given (doc_id, text) rows. */
  def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(SearchOps.analyze(col("text"))).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Merge the dirty documents' postings into the store at `storePath`.
    * Idempotent per batch; crash-safe via the staged rename swap.
    */
  def upsert(spark: SparkSession, storePath: String, dirtyDocs: DataFrame): Unit = {
    val fresh = postingsOf(dirtyDocs)
    graft.sinks.AtomicSwap.recover(spark, storePath)
    // resolve the FS from the store path so s3a://-style stores work
    val storeP = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(storeP)
    val merged =
      if (!exists) fresh
      else {
        val dirtyIds = dirtyDocs.select(col("doc_id")).distinct()
        spark.read.parquet(storePath)
          .join(dirtyIds, Seq("doc_id"), "left_anti")
          .unionByName(fresh)
      }
    graft.sinks.AtomicSwap.replace(spark, merged, storePath)
  }

  /** The maintained store as a postings DataFrame for the search faces.
    * Schema-cached read: (token, doc_id, tf) is the store's contract, so
    * repeat queries skip the footer-inference job (ticks rewrite content,
    * never the schema).
    */
  def load(spark: SparkSession, storePath: String): DataFrame = {
    graft.sinks.AtomicSwap.recover(spark, storePath)
    graft.Tables.parquetCached(spark, storePath)
  }
}

/** The watermark-driven face of [[IncrementalPostings]] — the reference's
  * search half of the tick as a pipeline: detect documents changed since
  * the persisted watermark, merge their recomputed postings into the store,
  * commit the watermark AFTER the sink (the same T2/T3 ordering
  * [[IncrementalDocPipeline]] uses; a crash between sink and commit
  * re-merges the batch, which the ghost-safe upsert absorbs — effectively
  * once). With this, `ReferenceEtl`'s document rebuilds and the search
  * index share one operational model: poll, prune to dirty, rebuild, swap.
  */
class IncrementalSearchPipeline(
    changes: SparkSession => DataFrame, // (doc_id, text, modified)
    storePath: String,
    statePath: String) {

  private val Epoch = java.sql.Timestamp.valueOf("1000-01-01 00:00:00")

  def currentWatermark(spark: SparkSession): java.sql.Timestamp =
    try {
      val r = spark.read.parquet(statePath).agg(max("wm")).head
      if (r.isNullAt(0)) Epoch else r.getTimestamp(0)
    } catch { case _: Exception => Epoch }

  /** One tick. Returns the number of distinct re-indexed doc ids. */
  def tick(spark: SparkSession): Long = {
    val wm = currentWatermark(spark)
    val dirty = changes(spark).filter(col("modified") > lit(wm))
    val head = dirty.agg(
      count(lit(1)).as("n_changes"),
      max("modified").as("new_wm"),
      countDistinct("doc_id").as("n_ids")).head
    if (head.getLong(0) == 0L) return 0L
    // a doc changed twice in one batch: index its LATEST text — max by
    // (modified, text) struct so equal-timestamp ties are still
    // deterministic, the strictly-greater analog of the reference's
    // last-row-wins bulk ordering
    val latest = dirty
      .groupBy(col("doc_id"))
      .agg(max(struct(col("modified"), col("text"))).as("m"))
      .select(col("doc_id"), col("m").getField("text").as("text"))
    IncrementalPostings.upsert(spark, storePath, latest)
    import spark.implicits._
    Seq(head.getTimestamp(1)).toDF("wm")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(statePath)
    head.getLong(2)
  }
}
