package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's incremental layer
  * (SURVEY §2.7): the 10-second poll loop (etl/main.py:357-385) becomes a
  * trigger-driven stream; the JSON watermark file (etl/models_state.py:22-66)
  * becomes the checkpoint; at-least-once + idempotent-by-id sink (T7) is
  * reproduced by `IncrementalDocPipeline`'s dedupe-append.
  *
  * Every transform here takes a DataFrame/Dataset and works identically on a
  * batch or a streaming frame — the streaming-vs-batch decision stays at the
  * edges (read/write), which is what makes the operators testable with
  * MemoryStream and runnable as a nightly batch with the same code.
  */
/** Mutable-across-batches session accumulator (top-level: encoder codegen
  * for nested state classes trips Janino).
  */
case class SessionState(startMs: Long, endMs: Long, n: Long)

/** LSH bucket membership carried across batches (top-level for the same
  * encoder reason as SessionState).
  */
case class BucketMember(doc_id: Long, sig: Seq[Long])
case class BucketState(members: List[BucketMember])

object StreamingOps {

  case class Event(event_id: Long, user_id: Long, event_type: String,
                   ts: java.sql.Timestamp, value: Double)

  case class SessionSummary(user_id: Long, session_start: Long,
                            session_end: Long, n_events: Long)


  /** T5-analog: event-time tumbling window aggregate with a real watermark —
    * late data beyond 10 minutes is dropped, state is bounded (the property
    * the reference's wall-clock poll loop never had).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** T2/T7-analog: exactly-once-effective dedup by event id within the
    * watermark horizon — the streaming face of idempotent re-delivery.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Curation at INGEST: the stateless slice of the curation gate
    * ([[graft.ops.TextOps.ingestGate]]) applied to a streaming documents
    * frame — quality rules + eval-gram contamination as one per-row
    * projection, so every micro-batch is gated with zero state and the
    * verdicts are identical to the batch gate on the same rows
    * (StreamingSpec asserts it). Duplicate pruning is the stateful tier:
    * route kept docs through [[streamingNearDup]] and drop hits at the
    * sink.
    */
  def streamingQualityGate(docs: DataFrame, evalGrams: Seq[Long],
                           nGram: Int = 8): DataFrame =
    graft.ops.TextOps.ingestGate(docs, evalGrams, nGram)

  case class DupHit(left_id: Long, right_id: Long, est_jaccard: Double)

  /** Streaming near-duplicate detection — ingestion-time dedup, the
    * stateful-stream face of [[graft.ops.DedupOps.minhashPairs]]: each
    * incoming document's 8-slot minhash signature is banded exactly like
    * the batch generator (4 bands × 2 raw slots, same native
    * `shingle_hash60` → `minhash_slots` pipeline), each band row routes to
    * its bucket's state, and a new arrival is compared ONLY against its
    * buckets' members — never the corpus. A hit is emitted the moment the
    * second copy arrives, in whatever batch that is; a batch pipeline only
    * finds pairs that co-exist in one run.
    *
    * State bound: an ADMISSION CAP of `maxBucket` members per bucket — the
    * streaming analog of the batch census guard. Divergence, documented: the
    * batch guard drops a hot bucket retroactively (it sees the final
    * census); a stream cannot retract, so the first `maxBucket` members of
    * a hot bucket still pair while later arrivals are skipped. A pair
    * sharing several bands is emitted once per shared band — dedup at the
    * sink (`dropDuplicates(left_id, right_id)` or DedupeAppendSink), same
    * as any at-least-once source.
    */
  def streamingNearDup(docs: DataFrame, threshold: Double = 0.5,
                       maxBucket: Int = 64)
                      (implicit spark: SparkSession): Dataset[DupHit] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val nHashes = 8
    val banded = docs
      .select(col("doc_id"),
        call_function("minhash_slots",
          call_function("shingle_hash60", col("text"), lit(5)),
          lit(nHashes)).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(nHashes / 2 - 1)),
          b => concat_ws(":",
            element_at(col("sig"), b * 2 + 1),
            element_at(col("sig"), b * 2 + 2)))))
      .select(concat_ws("#", col("pos"), col("col")).as("bucket"),
        col("doc_id"), col("sig"))
      .as[(String, Long, Seq[Long])]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[DupHit]
          // doc_id order inside the batch: deterministic pair emission no
          // matter how the micro-batch interleaved the rows
          rows.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
            if (!members.exists(_.doc_id == id) && members.size < maxBucket) {
              members.foreach { m =>
                val est = sig.iterator.zip(m.sig.iterator)
                  .count { case (a, b) => a == b }.toDouble / nHashes
                if (est >= threshold) {
                  val (l, r) = if (m.doc_id < id) (m.doc_id, id) else (id, m.doc_id)
                  out += DupHit(l, r, est)
                }
              }
              members = BucketMember(id, sig) :: members
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** Streaming percolation — saved-search ALERTING at ingest time, the
    * streaming face of [[graft.ops.SearchOps.percolate]]: each micro-batch
    * of incoming documents is analyzed map-side and matched against the
    * registered conjunctive queries, which ride the closure as a bounded
    * driver array (ES likewise keeps the percolator index memory-resident
    * per shard). STATELESS — a pure per-row flatMap, so it runs in append
    * mode with no watermark, no shuffle, and no state store; an alert
    * (doc_id, query_id) is emitted in the same micro-batch the document
    * arrives. Batch-equivalence is the contract: the union of alerts over
    * any batch slicing equals the batch percolate over the same rows
    * (StreamingSpec asserts it).
    */
  def streamingPercolate(docs: DataFrame,
                         queries: Array[(Long, Seq[String])])
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    docs
      .select(col("doc_id"), graft.ops.SearchOps.analyze(col("text")).as("toks"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, toks) =>
        val ts = toks.toSet
        queries.iterator.filter(_._2.forall(ts)).map(q => (id, q._1))
      }
      .toDF("doc_id", "query_id")
  }

  /** Custom stateful operator: gap-based sessionization via
    * flatMapGroupsWithState (KeyValueGroupedDataset), event-time timeout.
    * Emits a session when the gap since the last event exceeds `gapMs`
    * (or on state timeout when the watermark passes the session's horizon).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.startMs, s.endMs, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            // accumulator for out-of-order arrivals landing BEFORE the stored
            // session: consecutive within-gap late events chain into ONE
            // session here (emitting each immediately would fragment them
            // into 1-event sessions)
            var early: Option[SessionState] = None
            val out = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // cross-batch arrival more than a gap BEFORE the stored
                // session: chain it with other early arrivals, not a merge
                case Some(s) if t < s.startMs - gapMs =>
                  early match {
                    case Some(es) if t - es.endMs <= gapMs =>
                      early = Some(SessionState(es.startMs, math.max(es.endMs, t), es.n + 1))
                    case Some(es) =>
                      out += SessionSummary(userId, es.startMs, es.endMs, es.n)
                      early = Some(SessionState(t, t, 1))
                    case None =>
                      early = Some(SessionState(t, t, 1))
                  }
                case Some(s) if t - s.endMs <= gapMs =>
                  // min() start: a late within-watermark event may precede the
                  // stored session start (cross-batch out-of-order)
                  cur = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.endMs, t), s.n + 1))
                case Some(s) =>
                  out += SessionSummary(userId, s.startMs, s.endMs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            // flush the early chain: if it grew to within a gap of the
            // current session's start, it IS the same session — merge; else
            // emit it as its own completed (earlier) session
            early.foreach { es =>
              cur match {
                case Some(s) if s.startMs - es.endMs <= gapMs =>
                  cur = Some(SessionState(math.min(es.startMs, s.startMs),
                    math.max(es.endMs, s.endMs), es.n + s.n))
                case _ =>
                  out += SessionSummary(userId, es.startMs, es.endMs, es.n)
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark or Spark throws;
              // a session already past the horizon just times out next batch
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
