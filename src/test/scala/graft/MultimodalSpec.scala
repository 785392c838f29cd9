package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("decodeMedia: one output row per document, deterministic, typed fields populated") {
    val a = MultimodalOps.decodeMedia(spark, sf).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeMedia(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length === Tables.documents(spark, sf).count())
    assert(a.toSeq === b.toSeq) // stub decode is deterministic
    a.foreach { m =>
      assert(m.byte_len > 0 && m.payload_md5.length === 32)
      m.media_type match {
        case "image" => assert(m.width > 0 && m.height > 0 && m.sample_rate === 0)
        case "audio" => assert(m.sample_rate >= 8000 && m.width === 0)
        case "video" => assert(m.width > 0 && m.n_frames >= 1)
      }
    }
  }

  test("multimodalMeta: media_type follows doc_id mod 3; byte_len = utf8 length") {
    val out = MultimodalOps.multimodalMeta(spark, sf)
    val bad = out.withColumn("expect",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .filter(col("media_type") =!= col("expect"))
    assert(bad.count() === 0)
    assert(out.filter(col("byte_len") <= 0).count() === 0)
  }

  test("resizeStage: payload bounded by target raster, dims set, deterministic") {
    val out = MultimodalOps.resizeStage(spark, sf, targetW = 32, targetH = 32).collect()
    assert(out.length === Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.payload.length <= 32 * 32)
      assert(r.width === 32 && r.height === 32)
    }
    val again = MultimodalOps.resizeStage(spark, sf, targetW = 32, targetH = 32).collect()
    assert(out.sortBy(_.doc_id).map(_.payload.toSeq).toSeq ===
      again.sortBy(_.doc_id).map(_.payload.toSeq).toSeq)
  }

  test("frameSample: every k-th frame of videos only; count = ceil(n_frames/k)") {
    val every = 7
    val frames = MultimodalOps.frameSample(spark, sf, every).collect()
    val videos = MultimodalOps.decodeMedia(spark, sf).collect()
      .filter(_.media_type == "video")
    val expected = videos.map(v => (v.n_frames + every - 1) / every).sum
    assert(frames.length === expected)
    // frame indices are the sampled grid, md5s are well-formed and distinct
    // per (doc, frame)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq === fs.map(_.frame_idx).sorted.distinct.toSeq)
      assert(fs.forall(f => f.frame_idx % every === 0 && f.frame_md5.length === 32))
    }
  }

  test("metadata projection prunes the payload column at the scan") {
    val plan = MultimodalOps.mediaTable(spark, sf)
      .select("doc_id", "media_type")
      .queryExecution.executedPlan.toString
    // binary payload (from `text`) must not be read for a metadata-only query
    assert(!plan.contains("payload"))
  }

  test("mediaAnn: payload → stub embedding → retrieval; self-hit first; bounded values") {
    val out = MultimodalOps.mediaAnn(spark, sf).collect()
    assert(out.length === 10)
    // cos(q, q) = 1: the query doc's own media ranks first
    assert(out.head.getAs[Long]("doc_id") === 0L)
    assert(math.abs(out.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = out.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // embedding derivation: deterministic, in [-1, 1), identical rerun
    import org.apache.spark.sql.functions._
    val v = MultimodalOps.mediaTable(spark, sf)
      .select(MultimodalOps.stubEncode(md5(col("payload"))).as("v"))
      .head.getSeq[Double](0)
    assert(v.length === 64)
    assert(v.forall(x => x >= -1.0 && x < 1.0))
    val again = MultimodalOps.mediaAnn(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }
}
