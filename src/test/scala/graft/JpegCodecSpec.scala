package graft

import graft.ops.{BmpCodec, JpegCodec}

class JpegCodecSpec extends SparkSpecBase {

  /** The closed-form DC chain — what the DuckDB oracle replays. */
  private def dcChain(ch: Int, q: Int): Int = {
    val t = ch - 128
    val a = 64 * t
    val dq = if (a >= 0) (a + 4 * q) / (8 * q) else -((-a + 4 * q) / (8 * q))
    val c = dq * q
    math.min(255, math.max(0, 128 + ((c + 4) >> 3)))
  }

  private def blockLaw(seed: Long, i: Int): (Int, Int, Int) = (
    ((seed * 131 + i * 17) % 256).toInt,
    ((seed * 131 + i * 29) % 256).toInt,
    ((seed * 131 + i * 47) % 256).toInt)

  test("zigzag order matches the standard scan prefix") {
    assert(JpegCodec.zigzag.take(16).toSeq ===
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5))
    assert(JpegCodec.zigzag.sorted.toSeq === (0 until 64))
  }

  test("DC-only blocks round-trip through the EXACT closed form the oracle replays") {
    for (seed <- Seq(0L, 7L, 41L, 123L)) {
      val wb = 1 + (seed % 4).toInt; val hb = 1 + (seed % 3).toInt
      val img = JpegCodec.decode(JpegCodec.synthDc(seed, wb, hb))
      assert(img.width === wb * 8 && img.height === hb * 8)
      for (by <- 0 until hb; bx <- 0 until wb) {
        val i = by * wb + bx
        val (r, g, b) = blockLaw(seed, i)
        val y = JpegCodec.rgbToY(r, g, b)
        val cb = JpegCodec.rgbToCb(r, g, b)
        val cr = JpegCodec.rgbToCr(r, g, b)
        val y2 = dcChain(y, 6)    // qLuma(0,0)
        val cb2 = dcChain(cb, 8) // qChroma(0,0)
        val cr2 = dcChain(cr, 8)
        val er = JpegCodec.yccToR(y2, cr2)
        val eg = JpegCodec.yccToG(y2, cb2, cr2)
        val eb = JpegCodec.yccToB(y2, cb2)
        // every pixel of the block must equal the closed form exactly
        for (py <- 0 until 8; px <- 0 until 8) {
          val d = ((by * 8 + py) * img.width + bx * 8 + px) * 3
          assert((img.rgb(d) & 0xff) === er, s"R block $i seed $seed")
          assert((img.rgb(d + 1) & 0xff) === eg, s"G block $i seed $seed")
          assert((img.rgb(d + 2) & 0xff) === eb, s"B block $i seed $seed")
        }
      }
    }
  }

  test("general images: lossy round trip with bounded per-pixel error, exact dims, edge padding") {
    for ((seed, w, h) <- Seq((3L, 24, 16), (9L, 17, 13), (55L, 8, 8), (2L, 33, 9))) {
      // real content: the BMP synth's xorshift noise — worst case for DCT
      val src = BmpCodec.decode(BmpCodec.synth(seed, w, h))
      val jpeg = JpegCodec.encode(src)
      assert(JpegCodec.isJpeg(jpeg))
      val out = JpegCodec.decode(jpeg)
      assert(out.width === w && out.height === h)
      var maxErr = 0
      var k = 0
      while (k < src.rgb.length) {
        val e = math.abs((src.rgb(k) & 0xff) - (out.rgb(k) & 0xff))
        if (e > maxErr) maxErr = e
        k += 1
      }
      // random noise at these quant steps: generous but real bound
      assert(maxErr <= 64, s"seed $seed ${w}x$h: max per-pixel error $maxErr")
      // smooth content should reconstruct much tighter
      val flat = BmpCodec.Image(16, 16, Array.tabulate(16 * 16 * 3)(i => (40 + (i / 48)).toByte))
      val fo = JpegCodec.decode(JpegCodec.encode(flat))
      val ferr = flat.rgb.indices.map(i => math.abs((flat.rgb(i) & 0xff) - (fo.rgb(i) & 0xff))).max
      assert(ferr <= 8, s"smooth-gradient error $ferr")
    }
  }

  test("decoder is stream-driven: tables come from DQT/DHT; rejects truncation, non-JPEG, progressive") {
    val good = JpegCodec.synthDc(5L, 2, 2)
    intercept[IllegalArgumentException](
      JpegCodec.decode(java.util.Arrays.copyOf(good, good.length / 2)))
    intercept[IllegalArgumentException](JpegCodec.decode(Array[Byte](1, 2, 3, 4)))
    // flip SOF0 (0xC0) to progressive SOF2 (0xC2) → explicit reject
    val prog = good.clone()
    var i = 2
    var flipped = false
    while (i < prog.length - 1 && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    intercept[IllegalArgumentException](JpegCodec.decode(prog))
    // 0xFF fill bytes before a marker are spec-legal — splice one before DQT
    val dqtPos = (2 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdb).get
    val filled = good.take(dqtPos) ++ Array(0xff.toByte) ++ good.drop(dqtPos)
    assert(JpegCodec.decode(filled).rgb.toSeq === JpegCodec.decode(good).rgb.toSeq)
    // EOI with no scan must be an explicit reject, not a garbage parse
    val noScan = good.take(2) ++ Array(0xff.toByte, 0xd9.toByte)
    intercept[IllegalArgumentException](JpegCodec.decode(noScan))
  }

  test("MJPEG pipeline: sampled frames are real JPEGs; features match the frame law replay") {
    import org.apache.spark.sql.functions.col
    val media = graft.ops.MultimodalOps.mjpegMediaTable(spark, sf)
      .filter(col("media_type") === "video")
      .select("doc_id", "payload").collect()
    assert(media.nonEmpty)
    // the container holds decodable JPEG frames at every sampled position
    val (id0, payload0) = (media.head.getLong(0), media.head.getAs[Array[Byte]](1))
    graft.ops.AviCodec.sampledFrames(payload0, 5).foreach { case (fi, fb) =>
      assert(JpegCodec.isJpeg(fb), s"frame $fi is not a JPEG")
      val img = JpegCodec.decode(fb)
      assert(img.width === 16 && img.height === 8)
      // block 0 replays the closed form for seed doc_id + 7*fi
      val (r, g, b) = blockLaw(id0 + 7L * fi, 0)
      val y2 = dcChain(JpegCodec.rgbToY(r, g, b), 6)
      val cb2 = dcChain(JpegCodec.rgbToCb(r, g, b), 8)
      val cr2 = dcChain(JpegCodec.rgbToCr(r, g, b), 8)
      assert((img.rgb(0) & 0xff) === JpegCodec.yccToR(y2, cr2), s"frame $fi R")
    }
    // row counts: ceil(n/5) per video, never n
    val out = graft.ops.MultimodalOps.mjpegFrameFeatures(spark, sf)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, c) =>
      val n = 12 + (id % 12)
      assert(c === (n + 4) / 5, s"doc $id: $c sampled of $n frames")
    }
  }

  test("entropy stream uses real byte stuffing and DC prediction across MCUs") {
    // general noisy encodes carry kilobytes of entropy data — some byte
    // WILL be 0xFF and must arrive stuffed (deterministic fixtures)
    val streams = (0L to 30L).map(s => JpegCodec.encode(BmpCodec.decode(BmpCodec.synth(s, 32, 16))))
    assert(streams.exists { bs =>
      (0 until bs.length - 1).exists(i =>
        (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == 0x00)
    }, "no stream exercised byte stuffing in 31 fixtures")
    // DC prediction: two images differing only in a LATER block decode to
    // identical earlier blocks (the prediction chain resets nothing)
    val a = JpegCodec.decode(JpegCodec.synthDc(11L, 4, 1))
    val b0 = JpegCodec.decode(JpegCodec.synthDc(11L, 4, 2))
    for (k <- 0 until 8 * 8 * 3)
      assert(a.rgb(k) === b0.rgb(k), s"first block diverged at byte $k")
  }
}
