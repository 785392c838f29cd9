package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** LIVE Elasticsearch bulk delivery over HTTP — the one reference behavior
  * the file-mode [[BulkIndexSink]] never executed (`etl/main.py:169`
  * `es.bulk(...)`; index bootstrap `:297-311` with `ignore=400`). Same
  * payload law as the file sink (interleaved action/document ndjson, `_id`
  * idempotence), but each batch POSTs to `{baseUrl}/_bulk` from its own
  * executor task — delivery parallelism = input partitions, exactly how
  * es-hadoop ships documents.
  *
  * ES response semantics, handled for real:
  *  - transport errors / HTTP 5xx / 429 retry the WHOLE batch with
  *    exponential full-jitter backoff ([[Retry.withBackoff]] — the
  *    reference's `@backoff` decorator at the same granularity);
  *  - HTTP 200 with `"errors": true` retries ONLY the failed items
  *    (per-item status ≥ 300 → its action+doc pair re-posts), the
  *    standard bulk partial-retry loop — a poison item exhausts its
  *    retries and fails LOUD with the server's error reason;
  *  - at-least-once + `_id` upsert ⇒ re-delivery is idempotent (T7).
  *
  * Index bootstrap: `PUT {baseUrl}/{index}` with the mapping; a 400
  * `resource_already_exists_exception` is the create-if-absent no-op,
  * any other failure is loud — the reference's `ignore=400` made precise.
  *
  * Offline-testable by construction: the spec drives this against an
  * in-process `com.sun.net.httpserver` ES stub (bulk accounting by `_id`,
  * injected 503s and per-item 429s), so the wire path runs for real with
  * zero egress.
  */
object BulkHttpSink {
  // a hung endpoint (accepted TCP, no response — dead LB, GC wall) must
  // become an exception the retry ladder can catch, never a stuck task
  private val ConnectTimeoutMs = 10000
  private val ReadTimeoutMs = 60000
  // thread-safe for reads; one per JVM, not one per request
  private val mapper = new ObjectMapper()

  // deterministic rejections (mapping conflict, payload too large) must
  // NOT re-run through the backoff ladder — only transport-shaped
  // failures retry (r14 review)
  private val retryOnIo: Throwable => Boolean =
    _.isInstanceOf[java.io.IOException]

  private def open(url: String, method: String,
                   contentType: String): java.net.HttpURLConnection = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    c.setDoOutput(true)
    c.setConnectTimeout(ConnectTimeoutMs)
    c.setReadTimeout(ReadTimeoutMs)
    c.setRequestProperty("Content-Type", contentType)
    c
  }

  /** PUT the index mapping, create-if-absent (retried like any other
    * transient-failure-prone request — the reference wraps bootstrap in
    * the same @backoff). True iff created here.
    */
  def bootstrapIndex(baseUrl: String, indexName: String,
                     schema: StructType): Boolean =
    Retry.withBackoff(retryOn = retryOnIo) {
      val c = open(s"$baseUrl/$indexName", "PUT", "application/json")
      val body = s"""{"mappings":${schema.json}}"""
      c.getOutputStream.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val code = c.getResponseCode
      val resp = readBody(c)
      c.disconnect()
      if (code / 100 == 2) true
      else if (code == 400 && resp.contains("resource_already_exists")) false
      else if (code == 429 || code / 100 == 5) throw new java.io.IOException(
        s"index bootstrap rejected: HTTP $code") // transient: retries
      else throw new IllegalStateException(
        s"index bootstrap failed hard: HTTP $code $resp")
    }

  /** POST `df` to `{baseUrl}/_bulk` in `batchSize`-document requests.
    * Returns the number of documents the server acknowledged.
    */
  def post(df: DataFrame, baseUrl: String, indexName: String, idCol: String,
           batchSize: Int = 1000, maxRetries: Int = 5): Long = {
    require(batchSize >= 1)
    bootstrapIndex(baseUrl, indexName, df.schema)
    // the file sink's payload law, one copy — same wire format by
    // construction, not by claim
    val payload = BulkIndexSink.payloadOf(df, indexName, idCol)
    // NB: a task-level Spark retry re-posts its partition — safe against
    // the INDEX (the _id upsert absorbs re-delivery, T7) but the counter
    // is then an at-least-once lower-bound metric, same contract as the
    // reference's logged row counts
    val counter = df.sparkSession.sparkContext.longAccumulator("bulk_http_docs")
    payload.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(batchSize).foreach { chunk =>
        val pairs = chunk.map(r => (r.getString(0), r.getString(1)))
        counter.add(postBatch(baseUrl, pairs, maxRetries))
      }
    }
    counter.value
  }

  /** One batch with the full ES retry ladder; returns docs acknowledged. */
  private[sinks] def postBatch(baseUrl: String,
                               pairs: Seq[(String, String)],
                               maxRetries: Int): Long = {
    var pending = pairs
    var acked = 0L
    var attempt = 0
    while (pending.nonEmpty) {
      // transport/5xx/429 (IOException-shaped) retries live inside
      // withBackoff — hard 4xx surfaces immediately; item-level partial
      // failures come back as the next `pending` set
      val failures = Retry.withBackoff(maxRetries = maxRetries,
        retryOn = retryOnIo) {
        postOnce(baseUrl, pending)
      }
      acked += pending.size - failures.size
      if (failures.nonEmpty) {
        attempt += 1
        if (attempt > maxRetries) throw new java.io.IOException(
          s"bulk items kept failing after $maxRetries retries: " +
            s"${failures.head._3} (${failures.size} items)")
        pending = failures.map(f => (f._1, f._2))
      } else pending = Nil
    }
    acked
  }

  /** One POST; throws on transport/whole-request failure (the backoff
    * unit), returns the FAILED (action, doc, reason) triples on a 200.
    */
  private def postOnce(baseUrl: String,
                       pairs: Seq[(String, String)]): Seq[(String, String, String)] = {
    val body = pairs.iterator
      .map { case (a, d) => a + "\n" + d }
      .mkString("", "\n", "\n")
    val c = open(s"$baseUrl/_bulk", "POST", "application/x-ndjson")
    c.getOutputStream.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val code = c.getResponseCode
    val resp = readBody(c)
    c.disconnect()
    if (code == 429 || code / 100 == 5)
      throw new java.io.IOException(s"bulk rejected: HTTP $code")
    if (code / 100 != 2)
      throw new IllegalStateException(s"bulk failed hard: HTTP $code $resp")
    val root = mapper.readTree(resp)
    if (!root.path("errors").asBoolean(false)) Seq.empty
    else {
      val items = root.path("items")
      require(items.size() == pairs.size,
        s"bulk response items ${items.size()} != requested ${pairs.size}")
      (0 until items.size()).flatMap { i =>
        val st = items.get(i).path("index").path("status").asInt(200)
        if (st < 300) None
        else Some((pairs(i)._1, pairs(i)._2,
          items.get(i).path("index").path("error").toString))
      }
    }
  }

  private def readBody(c: java.net.HttpURLConnection): String = {
    val in = if (c.getResponseCode / 100 == 2) c.getInputStream else c.getErrorStream
    if (in == null) ""
    else try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
