package graft

import graft.ops.MultimodalOps
import graft.streaming.IncrementalMedia
import org.apache.spark.sql.functions._

/** CDC maintenance of the media store: dirty-only re-encode, ghost-safe
  * re-merge, and O(dirty) codec work — the IncrementalPostings invariants
  * applied to payload bytes.
  */
class IncrementalMediaSpec extends SparkSpecBase {

  private def store(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    d.toString + "/media.parquet"
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Map[Long, (String, String)] =
    df.select(col("doc_id"), md5(col("payload")).as("h"), col("media_type"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap

  test("incremental merges converge to the full build; re-merge is a byte-identical no-op") {
    val path = store("incmedia")
    val full = MultimodalOps.gifMediaTable(spark, sf)
    // seed the store from one half of the corpus, then CDC in the rest
    val firstHalf = full.filter(pmod(col("doc_id"), lit(2)) === 0)
    val secondHalf = full.filter(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalMedia.upsert(spark, path, firstHalf)
    IncrementalMedia.upsert(spark, path, secondHalf)
    assert(canon(IncrementalMedia.load(spark, path)) === canon(full),
      "two incremental merges must equal the full build")
    // crash between sink and watermark commit → the batch re-merges:
    // the ghost-safe anti-join absorbs it byte for byte
    IncrementalMedia.upsert(spark, path, secondHalf)
    assert(canon(IncrementalMedia.load(spark, path)) === canon(full),
      "re-merging the same batch must be a no-op")
    assert(IncrementalMedia.load(spark, path).count() === full.count())
  }

  test("the machinery is kind-agnostic: the r14 H.264 inter store CDC-maintains the same way") {
    val path = store("incmedia3")
    val full = MultimodalOps.h264InterMediaTable(spark, sf)
    val firstHalf = full.filter(pmod(col("doc_id"), lit(2)) === 0)
    val secondHalf = full.filter(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalMedia.upsert(spark, path, firstHalf)
    IncrementalMedia.upsert(spark, path, secondHalf)
    assert(canon(IncrementalMedia.load(spark, path)) === canon(full),
      "incremental merges of IDR+P payloads must equal the full build")
    // and the merged payloads remain DECODABLE video, not just bytes
    val one = IncrementalMedia.load(spark, path)
      .filter(col("media_type") === "video")
      .orderBy("doc_id").select("doc_id", "payload").head()
    val frames = graft.ops.H264Cavlc.decodeBaselineStream(one.getAs[Array[Byte]]("payload"))
    assert(frames.length === 2 + (one.getLong(0) % 2).toInt)
  }

  test("a dirty batch replaces exactly its own rows and the encode work is O(dirty)") {
    val path = store("incmedia2")
    IncrementalMedia.upsert(spark, path, MultimodalOps.gifMediaTable(spark, sf))
    val before = canon(IncrementalMedia.load(spark, path))
    // a 'new corpus version' for a 5% slice: those videos re-encode as
    // AVI instead of GIF — distinguishable bytes, same schema. Dirty-only
    // encode is O(dirty) BY CONSTRUCTION: the synthesis map runs after
    // the dirty filter, so clean rows never reach a codec.
    val dirty = MultimodalOps.aviMediaTable(spark, sf)
      .filter(pmod(col("doc_id"), lit(20)) === 5)
    val dirtyIds = dirty.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dirtyIds.nonEmpty)
    IncrementalMedia.upsert(spark, path, dirty)
    val after = canon(IncrementalMedia.load(spark, path))
    assert(after.keySet === before.keySet)
    val want = canon(dirty)
    for ((id, v) <- after) {
      if (dirtyIds(id)) assert(v === want(id), s"dirty doc $id must carry the NEW payload")
      else assert(v === before(id), s"clean doc $id must be untouched")
    }
  }
}
