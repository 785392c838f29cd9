package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** T2 recovery semantics: the Structured Streaming checkpoint replaces the
  * reference's storage.json watermark file — on restart, already-committed
  * source files are not reprocessed, so an idempotent append sink yields
  * effectively-once output (SURVEY §2.7 T2/T7).
  */
class CheckpointRestartSpec extends SparkSpecBase {
  import spark.implicits._

  test("file-source stream + checkpoint: restart picks up only new files") {
    val base = "/tmp/graft_ckpt_test"
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    def runToCompletion(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode(SaveMode.Append).parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode(SaveMode.Append).parquet(src)
    runToCompletion()
    assert(spark.read.parquet(out).count() === 2)

    Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v")
      .write.mode(SaveMode.Append).parquet(src)
    runToCompletion() // restart from checkpoint: batch 1 files must NOT re-run
    val rows = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(1L, 2L, 3L, 4L, 5L), s"reprocessing detected: $rows")
  }

  test("streamingNearDup bucket state survives a checkpoint restart") {
    implicit val s = spark
    import graft.streaming.StreamingOps
    val base = "/tmp/graft_ndup_ckpt"
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val a = "the quick brown fox jumps over the lazy dog again and again"

    def runToCompletion(): Unit = {
      val q = StreamingOps.streamingNearDup(
          spark.readStream.schema(schema).parquet(src))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingOps.DupHit], _: Long) =>
            b.write.mode(SaveMode.Append).parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }

    Seq((1L, a), (2L, "different material on storage engines and planners"))
      .toDF("doc_id", "text").write.mode(SaveMode.Append).parquet(src)
    runToCompletion() // no duplicate yet; bucket state now holds doc 1

    Seq((3L, a + " extra")).toDF("doc_id", "text")
      .write.mode(SaveMode.Append).parquet(src)
    runToCompletion() // RESTART from checkpoint: doc 1's membership must
    // have been recovered from state, or the pair is silently lost
    val hits = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"))).toSet
    assert(hits === Set((1L, 3L)),
      s"pre-restart bucket members must pair with post-restart arrivals: $hits")
  }
}
