package graft

import graft.migrate.Migrate
import graft.sinks.{BulkIndexSink, DedupeAppendSink}
import graft.sources.JdbcSourceConfig
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  private def cleanDir(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); ()
  }

  test("BulkIndexSink: wire format, batching, doc count, mapping bootstrap") {
    val out = "/tmp/graft_bulk_test"
    cleanDir(out)
    val df = (1 to 25).map(i => (i.toLong, s"doc $i")).toDF("id", "body").repartition(2)
    val n = BulkIndexSink.write(df, out, "docs", "id", batchSize = 10)
    assert(n === 25)
    val dir = new java.io.File(out)
    val bulks = dir.listFiles().filter(_.getName.endsWith(".ndjson"))
    assert(bulks.length >= 3) // 2 partitions, batch 10 → ≥3 files
    val lines = bulks.flatMap(f =>
      java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String]))
    assert(lines.length === 50) // action + doc per row
    val actions = lines.filter(_.startsWith("""{"index":"""))
    assert(actions.length === 25)
    assert(actions.forall(_.contains(""""_index":"docs"""")))
    // every doc line round-trips as JSON with the id present
    val docs = lines.filterNot(_.startsWith("""{"index":"""))
    assert(docs.forall(d => d.startsWith("{") && d.contains(""""body":""")))
    // bootstrap is create-if-absent
    assert(new java.io.File(dir, "docs.mapping.json").exists())
    assert(!BulkIndexSink.bootstrapIndex(out, "docs", df.schema))
  }

  test("BulkIndexSink: stale bulk files from a wider failed attempt are dropped, mapping kept") {
    val out = "/tmp/graft_bulk_stale"
    cleanDir(out)
    new java.io.File(out).mkdirs()
    // a leftover from a hypothetical earlier attempt that planned MORE
    // (partition, batch) pairs than this run will — deterministic names
    // alone would never overwrite it, leaving duplicate documents
    val stale = java.nio.file.Paths.get(out, "bulk-99998-00099.ndjson")
    java.nio.file.Files.writeString(stale, "{\"index\":{}}\n{\"old\":true}\n")
    val df = (1 to 5).map(i => (i.toLong, s"doc $i")).toDF("id", "body").coalesce(1)
    val n = BulkIndexSink.write(df, out, "docs", "id", batchSize = 10)
    assert(n === 5)
    assert(!java.nio.file.Files.exists(stale), "stale bulk file must be removed")
    val lines = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".ndjson"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String]))
    assert(lines.length === 10) // exactly this run's 5 docs, no stale rows
    assert(new java.io.File(out, "docs.mapping.json").exists())
  }

  test("DedupeAppendSink: ON CONFLICT DO NOTHING semantics, idempotent re-run") {
    val target = "/tmp/graft_dedupe_sink"
    cleanDir(target)
    val batch1 = Seq((1L, "a"), (2L, "b"), (2L, "b_dup")).toDF("id", "v")
    assert(DedupeAppendSink.append(batch1, target, "id") === 2) // in-batch dup dropped
    // conflicting id 2 ignored (existing wins), id 3 appended
    val batch2 = Seq((2L, "CHANGED"), (3L, "c")).toDF("id", "v")
    assert(DedupeAppendSink.append(batch2, target, "id") === 1)
    val rows = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows(2L) !== "CHANGED") // DO NOTHING, not DO UPDATE
    // full re-run of batch1+2 appends nothing
    assert(DedupeAppendSink.append(batch1.union(batch2), target, "id") === 0)
  }

  test("JdbcSourceConfig: partitioned read options + pushdown predicate") {
    val cfg = JdbcSourceConfig(
      url = "jdbc:postgresql://db/movies", table = "content.film_work",
      partitionColumn = Some("modified_epoch"), lowerBound = Some("0"),
      upperBound = Some("1700000000"), numPartitions = 16,
      pushdownPredicate = Some("modified > '2024-01-01'"))
    val o = cfg.options
    assert(o("dbtable") === "(SELECT * FROM content.film_work WHERE modified > '2024-01-01') AS src")
    assert(o("numPartitions") === "16" && o("partitionColumn") === "modified_epoch")
    assert(o("fetchsize") === "10000")
    intercept[IllegalArgumentException] {
      JdbcSourceConfig("u", "t", partitionColumn = Some("c")).options
    }
  }

  test("Migrate.copyTable + reconcile: green path and each red path") {
    val src = "/tmp/graft_mig_src"; val dst = "/tmp/graft_mig_dst"
    cleanDir(src); cleanDir(dst)
    Tables.customer(spark, sf).write.mode(SaveMode.Overwrite).parquet(src)
    val n = Migrate.copyTable(spark, src, dst, "c_custkey")
    assert(n === Tables.customer(spark, sf).count())
    // re-run is a no-op (idempotent migration)
    assert(Migrate.copyTable(spark, src, dst, "c_custkey") === 0)
    val green = Migrate.reconcile(
      spark.read.parquet(src), spark.read.parquet(dst), "c_custkey")
    assert(green.ok, green.toString)

    // red: value drift is caught by checksum even when counts/keys match
    val drifted = spark.read.parquet(src)
      .withColumn("c_name", when(col("c_custkey") === 1, lit("TAMPERED"))
        .otherwise(col("c_name")))
    val r1 = Migrate.reconcile(spark.read.parquet(src), drifted, "c_custkey")
    assert(!r1.checksumMatch && r1.srcRows === r1.dstRows)
    // red: missing rows caught by count + anti-join
    val partial = spark.read.parquet(src).filter(col("c_custkey") =!= 1)
    val r2 = Migrate.reconcile(spark.read.parquet(src), partial, "c_custkey")
    assert(r2.srcOnlyKeys === 1 && !r2.ok)
    // red: schema drift
    val r3 = Migrate.reconcile(spark.read.parquet(src),
      spark.read.parquet(dst).withColumnRenamed("c_name", "name"), "c_custkey")
    assert(!r3.columnsMatch)
  }
}
