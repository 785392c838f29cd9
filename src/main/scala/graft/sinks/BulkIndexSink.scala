package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ES-bulk-shaped document sink (reference: etl/main.py:159-177 save_movies —
  * interleaved `{"index":{"_index":i,"_id":id}}` action + document lines,
  * pushed with es.bulk; index bootstrap etl/main.py:297-311).
  *
  * Offline build (no ES connector jar, zero egress): the sink emits the exact
  * wire format as partition-parallel JSON-lines "bulk request" files. A live
  * deployment replaces `writePartition`'s file write with an HTTP POST of the
  * same payload — everything upstream (serialization, batching, idempotent
  * `_id`, retry unit) is unchanged. Idempotence: the ES `index` op is an
  * upsert by `_id`, so at-least-once re-delivery of a bulk file is safe (T7).
  *
  * Scale: one bulk file per task ⇒ parallelism = partitions of the input;
  * `batchSize` bounds each request body exactly like the reference's
  * 100-row fetchmany batches (etl/main.py:136).
  */
object BulkIndexSink {

  /** Index-bootstrap analog: persist the mapping (schema) once, next to the
    * bulk files — create-if-absent like es.indices.create.
    */
  def bootstrapIndex(outDir: String, indexName: String, schema: StructType): Boolean = {
    val dir = new java.io.File(outDir); dir.mkdirs()
    val f = new java.io.File(dir, s"$indexName.mapping.json")
    if (f.exists()) false
    else {
      java.nio.file.Files.writeString(f.toPath, schema.json)
      true
    }
  }

  /** THE bulk payload law, one copy (shared with [[BulkHttpSink]] so the
    * two delivery faces cannot drift): (action, doc) built with codegen'd
    * to_json, no driver funnel. The action line goes through to_json too
    * (not string concat) so an id containing a quote/backslash is escaped
    * instead of corrupting the line.
    */
  private[sinks] def payloadOf(df: DataFrame, indexName: String,
                               idCol: String): DataFrame =
    df.select(
      to_json(struct(struct(
        lit(indexName).as("_index"),
        col(idCol).cast("string").as("_id")).as("index"))).as("action"),
      to_json(struct(df.columns.map(col): _*)).as("doc"))

  /** Write `df` as bulk-API payload files under `outDir`, `_id` taken from
    * `idCol`. Returns the number of documents written.
    */
  def write(df: DataFrame, outDir: String, indexName: String, idCol: String,
            batchSize: Int = 1000): Long = {
    bootstrapIndex(outDir, indexName, df.schema)
    val payload = payloadOf(df, indexName, idCol)
    // T6: the whole bulk action retries with expo backoff (reference:
    // @backoff on save_movies, etl/main.py:156-158); file names are
    // deterministic per (partition, batch), so a re-run overwrites rather
    // than duplicates — idempotent at-least-once. The doc counter is created
    // INSIDE the retried block: a failed attempt's partial task updates
    // would otherwise survive into the retry and inflate the returned count.
    Retry.withBackoff() {
      // overwrite-CLEAN, not just name-overlap-clean: if a retry plans fewer
      // partitions/batches than the failed attempt (AQE coalescing, upstream
      // change), stale bulk-*.ndjson from the wider grid would survive as
      // duplicate documents — drop every bulk file before each attempt
      // (the mapping file is kept: it's create-if-absent bootstrap state)
      Option(new java.io.File(outDir).listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith("bulk-") && f.getName.endsWith(".ndjson"))
          f.delete()
      })
      val counter = df.sparkSession.sparkContext.longAccumulator("bulk_docs")
      payload.foreachPartition { rows: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      rows.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
        val body = chunk.iterator
          .map(r => r.getString(0) + "\n" + r.getString(1))
          .mkString("", "\n", "\n")
        val f = java.nio.file.Paths.get(outDir, f"bulk-$pid%05d-$i%05d.ndjson")
        java.nio.file.Files.writeString(f, body)
        counter.add(chunk.size)
      }
      }
      counter.value
    }
  }
}
