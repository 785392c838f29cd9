package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's loop updates EVERY index per round from one change
  * detection (etl/main.py:357-385: each iteration runs all pipelines back
  * to back before sleeping) — this is that tick composed across the three
  * maintained stores this engine serves queries from:
  *
  *   1. detect dirty ids ONCE from the watermarked change feed,
  *   2. rebuild the full documents for the dirty ids → doc store
  *      ([[IncrementalDocPipeline.upsertDocs]]),
  *   3. re-index their postings → postings store
  *      ([[IncrementalPostings.upsert]]),
  *   4. re-assign their embeddings cell-wise → vector store
  *      ([[IncrementalVectors.upsert]]),
  *   5. commit ONE watermark, after ALL three sinks.
  *
  * Consistency model (the reason the watermark is singular and last): each
  * store's upsert is idempotent and individually crash-safe (staged rename
  * swaps, ghost-safe merges), so the composed tick needs no cross-store
  * transaction — a crash between any two stages leaves the watermark
  * unadvanced, the next tick re-detects the SAME dirty batch and re-runs
  * every stage, and the already-updated stores converge to the same bytes
  * while the stale ones catch up. At no point can a store be half-written
  * (per-store swap discipline) and at no point can the watermark claim a
  * batch any store has not absorbed (commit ordering). This is exactly the
  * reference's commit-after-es.bulk contract (etl/main.py:159-177) lifted
  * to three sinks.
  *
  * Scale shape: one detection job; the dirty batch is persisted so every
  * stage reads one materialization of a possibly-live feed (the
  * [[IncrementalVectorPipeline]] lesson); doc rebuild semi-join-prunes
  * before aggregation; postings/vector merges rewrite only dirty doc rows /
  * affected cells. Per-tick cost is O(dirty), never O(store).
  */
class ComposedEtlPipeline(
    changes: SparkSession => DataFrame, // (id, text, label, v, modified)
    docBuilder: (SparkSession, DataFrame) => DataFrame, // dirty-ids DF ("id") → full docs
    codebook: Seq[Seq[Double]],
    docStorePath: String,
    postingsStorePath: String,
    vectorStorePath: String,
    statePath: String,
    stampTimestamps: Boolean = false,
    // the reference's es.bulk network delivery under the COMPOSED tick
    // (r14 verdict task 7): invoked with the tick's rebuilt docs after all
    // three stores commit and before the single watermark commit — so a
    // delivery failure (sink down mid-outage) leaves the watermark
    // unmoved, the next tick re-detects the SAME dirty batch, the three
    // idempotent store upserts converge to identical bytes, and delivery
    // retries until the wire heals (ComposedEtlSpec proves it against a
    // live in-process ES stub with injected faults). Same named no-op
    // sentinel as [[IncrementalDocPipeline]]: with no deliverer wired the
    // rebuilt docs have one consumer and skip the persist.
    deliver: (SparkSession, DataFrame) => Unit = IncrementalDocPipeline.NoDeliver) {

  private val Epoch = java.sql.Timestamp.valueOf("1000-01-01 00:00:00")

  def currentWatermark(spark: SparkSession): java.sql.Timestamp = {
    // existence check first: exception-driven first-run detection would
    // dump an analysis stacktrace into every fresh pipeline's log
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Epoch
    else
      try {
        val r = spark.read.parquet(statePath).agg(max("wm")).head
        if (r.isNullAt(0)) Epoch else r.getTimestamp(0)
      } catch { case _: Exception => Epoch }
  }

  /** Crash-injection seam for the consistency spec: called after each sink
    * stage ("docs", "postings", "vectors") commits. A test overrides it to
    * throw, simulating a crash BETWEEN stages — production code leaves it
    * a no-op.
    */
  protected def afterStage(stage: String): Unit = ()

  /** One composed tick. Returns the number of distinct dirty ids absorbed
    * into all three stores (0 = caught up, nothing touched).
    */
  def tick(spark: SparkSession): Long = {
    val wm = currentWatermark(spark)
    // ONE detection, ONE materialization: every stage below (the watermark
    // aggregate, the doc rebuild's semi-join, the postings recompute, the
    // vector re-assignment) reads this persisted batch, so a live change
    // feed cannot show different rows to different stages — the silent-loss
    // hazard the per-store vector tick already defends against.
    val dirty = changes(spark).filter(col("modified") > lit(wm)).persist()
    try {
      val head = dirty.agg(
        count(lit(1)).as("n_changes"),
        max("modified").as("new_wm"),
        countDistinct("id").as("n_ids")).head
      if (head.getLong(0) == 0L) return 0L
      val newWm = head.getTimestamp(1)

      // an id changed twice in one batch: every store absorbs its LATEST
      // row — max by (modified, payload) struct, deterministic on ties,
      // the same last-row-wins the per-store ticks implement
      val latest = dirty
        .groupBy(col("id"))
        .agg(max(struct(col("modified"), col("text"), col("label"), col("v"))).as("m"))
        .select(col("id"),
          col("m").getField("text").as("text"),
          col("m").getField("label").as("label"),
          col("m").getField("v").as("v"))
        .persist()
      try {
        // stage 1: full-document rebuild for the dirty ids (T4 dirty-ids-
        // first semantics — docBuilder prunes its sources by semi-join).
        // With a deliverer wired the rebuilt docs gain a second consumer
        // (the network delivery below), so they persist across both — the
        // same two-consumer rule as the per-store pipeline: the delivery
        // must ship the exact doc version the store committed.
        val delivering = deliver ne IncrementalDocPipeline.NoDeliver
        val built = docBuilder(spark, dirty.select("id").distinct())
        val docs = if (delivering) built.persist() else built
        try {
          // keep the COMMITTED frame when delivering: with
          // stampTimestamps=true it is the stamped version the store
          // absorbed, and stage 4 must ship exactly that (r15 advice)
          val committed = IncrementalDocPipeline.upsertDocs(
            spark, docStorePath, docs, stampTimestamps,
            retainCommitted = delivering)
          afterStage("docs")

          // stage 2: search index — drop every posting of a dirty id,
          // append its recomputed rows
          IncrementalPostings.upsert(spark, postingsStorePath,
            latest.select(col("id").as("doc_id"), col("text")))
          afterStage("postings")

          // stage 3: vector index — cell-wise merge, only affected cells
          // rewritten
          IncrementalVectors.upsert(spark, vectorStorePath,
            latest.select(col("id").as("vec_id"), col("label"), col("v")), codebook)
          afterStage("vectors")

          // stage 4 (when wired): the reference's es.bulk network delivery
          // — last sink before the commit, so an outage pins the watermark
          // while the three stores stay converged; re-delivery next tick is
          // absorbed by the _id upsert (idempotent wire)
          if (delivering) {
            try deliver(spark, committed)
            finally if (committed ne docs) committed.unpersist()
            afterStage("deliver")
          }

          // SINGLE commit, after all sinks: the watermark never claims a
          // batch any sink has not absorbed
          import spark.implicits._
          Seq(newWm).toDF("wm").write.mode(SaveMode.Overwrite).parquet(statePath)
          head.getLong(2)
        } finally if (delivering) docs.unpersist()
      } finally latest.unpersist()
    } finally dirty.unpersist()
  }

  /** Run ticks until caught up (the test/batch driver's poll loop). */
  def runUntilCaughtUp(spark: SparkSession, maxTicks: Int = 100): Long = {
    var total = 0L
    var n = 0
    while (n < maxTicks) {
      val done = tick(spark)
      if (done == 0) return total
      total += done
      n += 1
    }
    total
  }
}

/** The composed tick as a DRIVER-GATED query (q_composed_tick): run the
  * reference's core loop — detect → rebuild docs → re-index postings →
  * re-assign vectors → commit ONE watermark (etl/main.py:357-385) — over a
  * deterministic change feed derived from the testdata tables, then emit
  * ALL THREE maintained stores' contents plus the committed watermark as
  * one uniform relation. The DuckDB oracle replays the whole loop
  * declaratively (latest-row-wins, the ru_en analyzer tokenization, the
  * argmax cell assignment, the max-modified watermark), so the tick's END
  * STATE is hash-gated — ComposedEtlSpec proves crash-convergence, this
  * row proves the converged bytes are the RIGHT bytes.
  *
  * Feed shape: documents⋈embeddings on id for id < 100, stamped with
  * synthetic per-id timestamps; every 7th id arrives TWICE (a later
  * " v2" rewrite), so the latest-wins merge is exercised on the gated
  * path, not just in spec fixtures. The tick is idempotent and
  * watermark-committed, so re-invocations detect an empty batch and serve
  * the same store bytes — the caught-up poll of the reference's loop.
  */
object ComposedEtlQuery {
  import org.apache.spark.sql.functions._

  private val BaseMicros = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val NList = 8
  private val MaxId = 100L

  private def feedRows(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text"))
      .filter(col("id") < MaxId)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    d.join(e, Seq("id"))
  }

  private def feed(dir: String)(spark: SparkSession): DataFrame = {
    val rows = feedRows(spark, dir)
    val first = rows.select(col("id"), col("text"), col("label"), col("v"),
      timestamp_micros(lit(BaseMicros) + col("id") * lit(1000000L))
        .as("modified"))
    // every 7th id is REWRITTEN later in the batch — latest-wins must pick
    // the " v2" payload for postings/vectors
    val second = rows.filter(col("id") % 7 === 0)
      .select(col("id"), concat(col("text"), lit(" v2")).as("text"),
        col("label"), col("v"),
        timestamp_micros(lit(BaseMicros) + col("id") * lit(1000000L) +
          lit(500000000L)).as("modified"))
    first.unionByName(second)
  }

  /** T4 semantics: the doc store rebuilds from the SOURCE tables for the
    * dirty ids (the reference rebuilds full documents from Postgres, not
    * from the change event's payload).
    */
  private def docBuilder(dir: String)(spark: SparkSession,
                                      ids: DataFrame): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text"), col("lang"), col("source"))
      .join(ids, Seq("id"), "left_semi")

  private def codebook(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NList)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  def composedTick(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.derivedStorePath(spark, "composedtick", dir,
      "documents.parquet")
    val pipeline = new ComposedEtlPipeline(
      feed(dir), docBuilder(dir), codebook(spark, dir),
      s"$base/docs", s"$base/postings", s"$base/vectors", s"$base/state")
    pipeline.runUntilCaughtUp(spark)
    // schema-cached reads (ticks rewrite content, never schemas) — raw
    // spark.read.parquet pays a footer-inference job per invocation
    val docs = graft.Tables.parquetCached(spark, s"$base/docs")
      .select(lit("docs").as("store"), col("id"),
        md5(col("text").cast("binary")).as("k"),
        length(col("text")).cast("long").as("n"))
    val posts = IncrementalPostings.load(spark, s"$base/postings")
      .select(lit("postings").as("store"), col("doc_id").as("id"),
        col("token").as("k"), col("tf").cast("long").as("n"))
    val vecs = IncrementalVectors.load(spark, s"$base/vectors")
      .select(lit("vectors").as("store"), col("vec_id").as("id"),
        col("label").cast("string").as("k"), col("cell").cast("long").as("n"))
    val state = graft.Tables.parquetCached(spark, s"$base/state")
      .select(lit("state").as("store"), lit(0L).as("id"), lit("wm").as("k"),
        unix_micros(col("wm")).as("n"))
    docs.unionByName(posts).unionByName(vecs).unionByName(state)
  }

  /** DuckDB replay of the WHOLE loop: feed → latest-row-wins → the three
    * store derivations → watermark. Tokenization replays through the same
    * duckToks fragment every search oracle uses; cell assignment replays
    * the argmax-with-larger-cid-ties the native `ivf_assign` implements.
    */
  val oracle: Map[String, String] = {
    val toks = graft.ops.SearchOps.duckToksOf("text")
    Map("q_composed_tick" ->
      s"""WITH cb AS (
         |  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id < $NList),
         |feed AS (
         |  SELECT d.doc_id AS id, d.text, e.label,
         |    CAST(e.embedding AS DOUBLE[]) AS v,
         |    $BaseMicros + d.doc_id * 1000000 AS m_us
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.doc_id < $MaxId
         |  UNION ALL
         |  SELECT d.doc_id, d.text || ' v2', e.label,
         |    CAST(e.embedding AS DOUBLE[]),
         |    $BaseMicros + d.doc_id * 1000000 + 500000000
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.doc_id < $MaxId AND d.doc_id % 7 = 0),
         |latest AS (
         |  SELECT id, text, label, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id
         |      ORDER BY m_us DESC) AS rn
         |    FROM feed) WHERE rn = 1),
         |docs_store AS (
         |  SELECT 'docs' AS store, d.doc_id AS id, md5(d.text) AS k,
         |    CAST(length(d.text) AS BIGINT) AS n
         |  FROM documents d
         |  WHERE d.doc_id IN (SELECT id FROM latest)),
         |toks AS (SELECT id, unnest($toks) AS token FROM latest),
         |posts AS (
         |  SELECT 'postings' AS store, id, token AS k,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM toks GROUP BY id, token),
         |assign AS (
         |  SELECT l.id, cb.cid,
         |    row_number() OVER (PARTITION BY l.id
         |      ORDER BY list_cosine_similarity(l.v, cb.cv) DESC,
         |        cb.cid DESC) AS rn
         |  FROM latest l CROSS JOIN cb),
         |vecs AS (
         |  SELECT 'vectors' AS store, a.id, CAST(l.label AS VARCHAR) AS k,
         |    CAST(a.cid AS BIGINT) AS n
         |  FROM assign a JOIN latest l USING (id) WHERE a.rn = 1),
         |state AS (
         |  SELECT 'state' AS store, CAST(0 AS BIGINT) AS id, 'wm' AS k,
         |    CAST(MAX(m_us) AS BIGINT) AS n FROM feed)
         |SELECT store, id, k, n FROM docs_store
         |UNION ALL SELECT store, id, k, n FROM posts
         |UNION ALL SELECT store, id, k, n FROM vecs
         |UNION ALL SELECT store, id, k, n FROM state""".stripMargin)
  }
}
