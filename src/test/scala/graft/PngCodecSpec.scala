package graft

import graft.ops.{BmpCodec, MultimodalOps, PngCodec}
import org.apache.spark.sql.functions._

class PngCodecSpec extends SparkSpecBase {

  test("encode∘decode round-trips pixels exactly through DEFLATE and all five filters") {
    // height ≥ 5 → the y%5 filter cycle emits None/Sub/Up/Average/Paeth
    for ((seed, w, h) <- Seq((0L, 8, 8), (7L, 17, 9), (41L, 31, 23), (5L, 1, 6))) {
      val bytes = PngCodec.synth(seed, w, h)
      val img = PngCodec.decode(bytes)
      assert(img.width === w && img.height === h)
      var k = 0
      while (k < img.rgb.length) {
        assert((img.rgb(k) & 0xff) === ((seed * 131 + k.toLong * 773) % 256).toInt,
          s"pixel law broken at byte $k of seed=$seed ${w}x$h")
        k += 1
      }
      // and a second trip over arbitrary (non-law) pixels
      val round = PngCodec.decode(PngCodec.encode(img))
      assert(round.rgb.toSeq === img.rgb.toSeq)
    }
  }

  test("decode verifies chunk CRCs and rejects truncation, non-PNG, and bad headers") {
    val good = PngCodec.synth(3L, 12, 7)
    assert(PngCodec.isPng(good))
    assert(!PngCodec.isPng(BmpCodec.synth(3L, 12, 7)))
    assert(!PngCodec.isPng(Array[Byte](1, 2, 3)))
    // flip one byte inside the IDAT payload → its CRC check must fire
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x40).toByte
    intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    intercept[IllegalArgumentException](
      PngCodec.decode(java.util.Arrays.copyOf(good, good.length - 10)))
    intercept[IllegalArgumentException](PngCodec.decode(BmpCodec.synth(3L, 12, 7)))
  }

  test("ancillary chunks are CRC-checked and skipped") {
    val good = PngCodec.synth(9L, 10, 6)
    // splice a tEXt chunk between IHDR (8+25 bytes) and IDAT
    val data = "graft".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data)
      .putInt(crc.getValue.toInt).array()
    val spliced = good.take(33) ++ chunk ++ good.drop(33)
    assert(PngCodec.decode(spliced).rgb.toSeq === PngCodec.decode(good).rgb.toSeq)
  }

  test("real PNG path end-to-end: ingest real compressed rasters → decoded dims → resize → embed") {
    val media = MultimodalOps.pngMediaTable(spark, sf).filter(col("media_type") === "image")
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { m =>
      assert(m.width === 8 + (m.doc_id % 24).toInt, s"doc ${m.doc_id} width")
      assert(m.height === 8 + (m.doc_id % 16).toInt, s"doc ${m.doc_id} height")
    }
    // resize stage takes the PNG arm: output payloads are PNGs of the target raster
    val resized = MultimodalOps.resizeStageOf(spark, media, 16, 16).collect()
    resized.foreach { r =>
      assert(PngCodec.isPng(r.payload))
      val img = PngCodec.decode(r.payload)
      assert(img.width === 16 && img.height === 16)
    }
  }

  test("imageFeatures matches a JVM-side replay of the pixel law (codec bypassed)") {
    val out = MultimodalOps.imageFeatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val w = 8 + (id % 24).toInt; val h = 8 + (id % 16).toInt
      val n = w * h * 3
      def p(k: Int): Long = (id * 131 + k.toLong * 773) % 256
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getLong(3) === (0 until n by 3).map(p).sum, s"sum_r doc $id")
      assert(r.getLong(4) === (1 until n by 3).map(p).sum, s"sum_g doc $id")
      assert(r.getLong(5) === (2 until n by 3).map(p).sum, s"sum_b doc $id")
      assert(r.getInt(6) === (0 until n).map(p).max.toInt, s"max_byte doc $id")
      val lum = (0 until 64).map { i =>
        val sy = (i / 8) * h / 8; val sx = (i % 8) * w / 8
        val b = (sy * w + sx) * 3
        77 * p(b) + 151 * p(b + 1) + 28 * p(b + 2)
      }.sum
      assert(r.getLong(7) === lum, s"lum8_sum doc $id")
    }
  }
}
