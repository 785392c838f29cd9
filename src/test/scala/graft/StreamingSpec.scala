package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, SessionSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hourlyCounts: event-time windows close when the watermark passes") {
    val input = MemoryStream[Event](spark)
    val q = StreamingOps.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hc").outputMode("append").start()
    try {
      input.addData(
        Event(1, 1, "click", ts("2024-01-01 10:05:00"), 1.0),
        Event(2, 1, "click", ts("2024-01-01 10:45:00"), 2.0),
        Event(3, 2, "view",  ts("2024-01-01 10:50:00"), 3.0))
      q.processAllAvailable()
      // watermark still inside hour 10 → nothing emitted yet (append mode)
      assert(spark.table("hc").count() === 0)
      // an event far ahead pushes the watermark past 11:00 → hour 10 closes
      input.addData(Event(4, 2, "view", ts("2024-01-01 13:00:00"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("hc").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toMap
      assert(rows === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("streamingQualityGate: micro-batch verdicts identical to the batch gate, contamination included") {
    graft.functions.GraftFunctions.register(spark)
    // eval set: the gram hashes of one planted 8-gram run
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val evalGrams = Seq((0L, run)).toDF("doc_id", "text")
      .select(explode(graft.ops.TextOps.gramHash60Composed(
        split(lower(trim(col("text"))), "\\s+"), 8)).as("g"))
      .collect().map(_.getLong(0)).toSeq
    // varied words (no dominant bigram), stopwords present, >50 chars
    val goodText = "the quick brown fox jumps over a lazy dog while many " +
      "other animals watch the bright morning sky and wonder about drifting " +
      "patterns of wind in tall grass near quiet rivers"
    val docs = Seq(
      (1L, "en", goodText),                              // kept
      (2L, "en", "short"),                               // low_quality
      (3L, "en", s"the $run of the benchmark " * 12),    // contaminated? no — quality first
      (4L, "en", goodText + " " + run))                  // kept-quality BUT contaminated
    val input = MemoryStream[(Long, String, String)](spark)
    val q = StreamingOps.streamingQualityGate(
        input.toDF().toDF("doc_id", "lang", "text"), evalGrams)
      .writeStream.format("memory").queryName("qg").outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("qg").collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
      assert(streamed.keySet === Set(1L, 2L, 3L, 4L))
      assert(streamed(1L) === (("kept", true)))
      assert(streamed(2L) === (("low_quality", false)))
      assert(streamed(4L) === (("contaminated", false)))
      // batch replay over the same rows must verdict identically
      val batch = graft.ops.TextOps.ingestGate(
          docs.toDF("doc_id", "lang", "text"), evalGrams)
        .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
      assert(batch === streamed)
    } finally q.stop()
  }

  test("dedupEvents: redelivered event ids collapse within the watermark") {
    val input = MemoryStream[Event](spark)
    val q = StreamingOps.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        Event(10, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Event(10, 1, "click", ts("2024-01-01 10:00:00"), 1.0), // same batch dup
        Event(11, 1, "click", ts("2024-01-01 10:01:00"), 1.0))
      q.processAllAvailable()
      input.addData( // cross-batch redelivery of id 10
        Event(10, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Event(12, 1, "click", ts("2024-01-01 10:02:00"), 1.0))
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(10L, 11L, 12L))
    } finally q.stop()
  }

  test("sessionize (streaming): gap splits sessions; timeout flushes the tail") {
    implicit val s = spark
    val input = MemoryStream[Event](spark)
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(
        Event(1, 7, "c", ts("2024-01-01 10:00:00"), 0),
        Event(2, 7, "c", ts("2024-01-01 10:10:00"), 0),
        Event(3, 7, "c", ts("2024-01-01 12:00:00"), 0)) // >30min gap → new session
      q.processAllAvailable()
      val first = spark.table("sess").as[SessionSummary].collect()
      assert(first.length === 1) // first session emitted inline
      assert(first.head.n_events === 2)
      assert(first.head.session_start === ts("2024-01-01 10:00:00").getTime)
      assert(first.head.session_end === ts("2024-01-01 10:10:00").getTime)
      // push watermark far past the open session → event-time timeout fires
      input.addData(Event(9, 8, "c", ts("2024-01-01 20:00:00"), 0))
      q.processAllAvailable()
      input.addData(Event(10, 8, "c", ts("2024-01-01 23:00:00"), 0))
      q.processAllAvailable()
      val all = spark.table("sess").as[SessionSummary].collect()
      val user7 = all.filter(_.user_id == 7)
      assert(user7.length === 2)
      assert(user7.map(_.n_events).sum === 3)
    } finally q.stop()
  }

  test("streaming sessionize ≡ batch sessionize on the same data") {
    implicit val s = spark
    // batch face over sf0.001 events
    val batch = graft.ops.EventsOps.sessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap

    // stream the same events through the stateful operator, flush with a
    // far-future sentinel, and compare per-user session counts
    // (see also the dedicated late-chain test below)
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event](spark)
    val q = StreamingOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessb").outputMode("append").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      input.addData(Event(-1, -1, "sentinel",
        new java.sql.Timestamp(evs.map(_.ts.getTime).max + 24L * 3600 * 1000), 0))
      q.processAllAvailable()
      input.addData(Event(-2, -1, "sentinel2",
        new java.sql.Timestamp(evs.map(_.ts.getTime).max + 48L * 3600 * 1000), 0))
      q.processAllAvailable()
      val streamed = spark.table("sessb").as[SessionSummary].collect()
        .filter(_.user_id >= 0)
        .groupBy(_.user_id)
        .map { case (u, ss) => u -> (ss.length.toLong, ss.map(_.n_events).sum) }
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionize: consecutive out-of-order late events chain into ONE earlier session") {
    implicit val s = spark
    // the out-of-order branch is reachable only when the session gap is
    // SMALLER than the watermark delay (10 min): older events are dropped
    // by the watermark before the operator sees them
    val gapMs = 5L * 60 * 1000
    val input = MemoryStream[Event](spark)
    val q = StreamingOps.sessionize(input.toDS(), gapMs)
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      // batch 1: a session at 10:00 establishes state; watermark → 09:50
      input.addData(Event(1, 7L, "click", ts("2024-01-01 10:00:00"), 0))
      q.processAllAvailable()
      // batch 2: two within-watermark late events 1 min apart, both more
      // than a gap BEFORE the stored session — they must form one 2-event
      // session, not two fragments
      input.addData(
        Event(2, 7L, "click", ts("2024-01-01 09:51:00"), 0),
        Event(3, 7L, "click", ts("2024-01-01 09:52:00"), 0))
      q.processAllAvailable()
      // flush the stored session via timeout sentinels
      input.addData(Event(-1, -1L, "s1", ts("2024-01-03 00:00:00"), 0))
      q.processAllAvailable()
      input.addData(Event(-2, -1L, "s2", ts("2024-01-05 00:00:00"), 0))
      q.processAllAvailable()
      val sessions = spark.table("sess_late").as[SessionSummary].collect()
        .filter(_.user_id == 7L).sortBy(_.session_start)
      assert(sessions.length === 2, sessions.mkString(", "))
      assert(sessions(0).n_events === 2) // the chained early pair
      assert(sessions(0).session_start === ts("2024-01-01 09:51:00").getTime)
      assert(sessions(0).session_end === ts("2024-01-01 09:52:00").getTime)
      assert(sessions(1).n_events === 1) // the original 10:00 session
    } finally q.stop()
  }

  test("streamingNearDup: cross-batch detection, streaming ≡ batch, est matches the slot agreement") {
    implicit val s = spark
    val a  = "the quick brown fox jumps over the lazy dog again and again"
    val a2 = a + " extra" // near-dup of a
    val b  = "completely different content about database systems and indexes"
    val c  = "unrelated third text talking about mountains rivers and weather"
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingOps.streamingNearDup(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nd").outputMode("append").start()
    val streamed =
      try {
        input.addData((1L, a), (2L, b))
        q.processAllAvailable()
        assert(spark.table("nd").count() === 0, "no duplicate exists yet")
        // the near-dup arrives in a LATER micro-batch — the case a batch
        // pipeline only catches if both copies co-exist in one run
        input.addData((3L, a2), (4L, c))
        q.processAllAvailable()
        spark.table("nd").collect()
          .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
            r.getAs[Double]("est_jaccard"))).toSet
      } finally q.stop()
    assert(streamed.map(h => (h._1, h._2)) === Set((1L, 3L)))

    // the SAME operator over the whole corpus as one batch finds the same
    // pairs with the same estimates (multi-band duplicates deduped — the
    // documented at-least-once contract)
    val batch = StreamingOps.streamingNearDup(
        Seq((1L, a), (2L, b), (3L, a2), (4L, c)).toDF("doc_id", "text"))
      .collect().map(h => (h.left_id, h.right_id, h.est_jaccard)).toSet
    assert(batch === streamed)

    // the emitted estimate IS the minhash slot-agreement fraction
    val sigs = Seq((1L, a), (3L, a2)).toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("minhash_slots",
          call_function("shingle_hash60", col("text"), lit(5)), lit(8)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y } / 8.0
    assert(est >= 0.5, s"planted near-dup must clear the threshold, got $est")
    streamed.foreach { case (_, _, e) => assert(e === est) }
  }

  test("streamingPercolate: alerts fire in-batch; union over any slicing ≡ the batch percolate") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val queries = graft.ops.SearchOps.percolatorQueries(spark, sf)
    assert(queries.length === 11 && queries.forall(_._2.length === 2))
    // the same batch slice the batch face uses, streamed in two pieces
    val batchDocs = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(97L)) === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(batchDocs.length >= 2)
    val (first, second) = batchDocs.splitAt(batchDocs.length / 2)
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingOps.streamingPercolate(
        input.toDF().toDF("doc_id", "text"), queries)
      .writeStream.format("memory").queryName("perc").outputMode("append").start()
    try {
      input.addData(first.toSeq: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("perc").count()
      input.addData(second.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("perc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // stateless: the first slice's alerts were already out before slice 2
      assert(afterFirst === streamed.count { case (d, _) => first.exists(_._1 == d) })
      val batch = graft.ops.SearchOps.percolate(spark, sf, k = 10000).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch, "streamed alert set must equal the batch percolate")
    } finally q.stop()
  }
}
