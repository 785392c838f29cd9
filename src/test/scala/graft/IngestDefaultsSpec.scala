package graft

import graft.sinks.IngestDefaults
import org.apache.spark.sql.functions._

/** F15/F16 write-path defaults (models.py:9-24 analogs). Nondeterministic
  * columns can't go through the DuckDB hash gate — these pin the contracts.
  */
class IngestDefaultsSpec extends SparkSpecBase {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val uuidV4 =
    "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}".r

  test("withUuidKey fills only missing ids, v4 format, unique (F15)") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("v", IntegerType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("keep-me", 1), Row(null, 2), Row(null, 3)),
      schema)
    val out = IngestDefaults.withUuidKey(df).collect()
    assert(out.find(_.getInt(1) == 1).get.getString(0) === "keep-me")
    val generated = out.filter(_.getInt(1) != 1).map(_.getString(0))
    generated.foreach(id => assert(uuidV4.matches(id), s"not a v4 uuid: $id"))
    assert(generated.distinct.length === 2)
  }

  test("withUuidKey adds the key column when absent") {
    import spark.implicits._
    val out = IngestDefaults.withUuidKey(Seq(1, 2).toDF("v")).collect()
    assert(out.map(_.getAs[String]("id")).distinct.length === 2)
  }

  test("stampInsert sets created == modified; stampUpsert preserves created (F16)") {
    import spark.implicits._
    val first = IngestDefaults.stampInsert(Seq((1L, "a"), (2L, "b")).toDF("id", "doc"))
      .cache() // one timestamp evaluation, reused below as "the store"
    first.collect().foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("created") != null)
      assert(r.getAs[java.sql.Timestamp]("created") ===
        r.getAs[java.sql.Timestamp]("modified"))
    }
    Thread.sleep(5) // ensure the refresh stamp can only be >= the insert stamp
    val incoming = Seq((1L, "a2"), (3L, "c")).toDF("id", "doc")
    val upserted = IngestDefaults.stampUpsert(incoming, first).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val origCreated = first.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[java.sql.Timestamp]("created")).toMap
    // updated row: created carried forward, modified refreshed
    assert(upserted(1L).getAs[java.sql.Timestamp]("created") === origCreated(1L))
    assert(!upserted(1L).getAs[java.sql.Timestamp]("modified").before(origCreated(1L)))
    // brand-new row: created stamped now
    assert(upserted(3L).getAs[java.sql.Timestamp]("created") != null)
    first.unpersist()
  }

  test("pipeline integration: stamped store preserves created across ticks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stamp").toString
    @volatile var feed = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val pipe = new graft.streaming.IncrementalDocPipeline(
      docBuilder = (s, dirty) => {
        import s.implicits._
        feed.map(_._1).distinct.toDF("id")
          .join(dirty, Seq("id"), "left_semi")
          .withColumn("doc", concat(lit("doc-"), col("id")))
      },
      changes = s => { import s.implicits._; feed.toDF("id", "modified") },
      storePath = s"$dir/store",
      statePath = s"$dir/state",
      stampTimestamps = true)
    assert(pipe.tick(spark) === 1L)
    val created0 = spark.read.parquet(s"$dir/store")
      .filter(col("id") === 1L).head.getAs[java.sql.Timestamp]("created")
    assert(created0 != null)
    // second tick updates the same doc: created survives, modified advances
    feed = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
    Thread.sleep(5)
    assert(pipe.tick(spark) === 1L)
    val row = spark.read.parquet(s"$dir/store").filter(col("id") === 1L).head
    assert(row.getAs[java.sql.Timestamp]("created") === created0)
    assert(!row.getAs[java.sql.Timestamp]("modified").before(created0))
  }
}
