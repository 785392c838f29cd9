package graft

import graft.ops.{H264Codec, MultimodalOps}
import org.apache.spark.sql.functions._

/** The H.264 structural tier: Annex-B NAL walk, emulation prevention,
  * exp-Golomb, SPS cropping law, slice-header access-unit rule — parsed
  * back from streams the synthesizer wrote through the same public
  * syntax, across a parameter sweep wide enough to hit frame_num wrap,
  * both start-code forms, EP-needing filler bytes, and every crop shape.
  */
class H264Spec extends SparkSpecBase {

  test("structural round trip across a parameter sweep: dims (crop law), AU count, IDR cadence") {
    for (seed <- 1L to 60L) {
      val nFrames = 1 + (seed % 45).toInt
      val (wMb, hMb) = (1 + (seed % 9).toInt, 1 + (seed % 6).toInt)
      val (cr, cb) = ((seed % 3).toInt, (seed % 2).toInt)
      val p = H264Codec.synth(seed, nFrames, wMb, hMb, cr, cb)
      assert(H264Codec.isAnnexB(p))
      val v = H264Codec.info(p)
      assert(v.sps.profileIdc === 66)
      assert(v.sps.width === 16 * wMb - 2 * cr, s"seed $seed width")
      assert(v.sps.height === 16 * hMb - 2 * cb, s"seed $seed height")
      assert(v.nFrames === nFrames, s"seed $seed AU count (frame_num wraps at 16)")
      assert(v.nIdr === (nFrames + 9) / 10, s"seed $seed IDR cadence")
      // NAL inventory: SPS + PPS + one slice per frame
      assert(H264Codec.nalUnits(p).size === nFrames + 2)
      // 7.4.1.1: no NAL may end in 0x00 (indistinguishable from
      // start-code padding — the parser's trim would eat payload)
      H264Codec.nalUnits(p).foreach { case (_, nal) =>
        assert(nal.last != 0, s"seed $seed: NAL ends in 0x00")
      }
    }
  }

  test("frame_num law: 0 at every IDR, reference-frame count since the IDR between") {
    val p = H264Codec.synth(11L, 25, 4, 3)
    val sps = H264Codec.parseSps(H264Codec.nalUnits(p).next()._2)
    val slices = H264Codec.nalUnits(p).collect {
      case (t, nal) if t == 1 || t == 5 => H264Codec.parseSliceHeader(nal, sps)
    }.toVector
    slices.zipWithIndex.foreach { case (s, i) =>
      assert(s.frameNum === (i % 10) % 16, s"frame $i")
      if (i % 10 == 0) assert(s.nalType === 5 && s.frameNum === 0)
    }
  }

  test("sampled access units: real coded-picture bytes, right indices, IDR where the cadence says") {
    val p = H264Codec.synth(7L, 35, 5, 4)
    val sampled = H264Codec.sampledAccessUnits(p, 10).toVector
    assert(sampled.map(_._1) === Vector(0, 10, 20, 30))
    sampled.foreach { case (i, nal) =>
      // every 10th frame is an IDR by the synth cadence — its NAL type
      // must say so, straight from the sampled bytes
      assert((nal(0) & 0x1f) === 5, s"AU $i must be an IDR slice NAL")
      val s = H264Codec.parseSliceHeader(nal,
        H264Codec.parseSps(H264Codec.nalUnits(p).next()._2))
      assert(s.firstMb === 0)
      assert(s.frameNum === 0, "7.4.3: IDR pictures carry frame_num 0")
    }
    // a non-aligned step samples P slices too
    val s3 = H264Codec.sampledAccessUnits(p, 3).toVector
    assert(s3.map(_._1) === (0 until 35 by 3).toVector)
    assert((s3(1)._2(0) & 0x1f) === 1) // AU 3: non-IDR
  }

  test("hostile inputs fail loud by name") {
    val p = H264Codec.synth(3L, 5, 4, 3)
    // high-profile chroma signalling: profile byte lives right after the
    // SPS NAL header (4-byte start code + 1 header byte)
    val highProfile = p.clone(); highProfile(5) = 100
    val e1 = intercept[IllegalArgumentException] { H264Codec.info(highProfile) }
    assert(e1.getMessage.contains("profile"))
    // forbidden_zero_bit
    val badHeader = p.clone(); badHeader(4) = (badHeader(4) | 0x80).toByte
    val e2 = intercept[IllegalArgumentException] { H264Codec.info(badHeader) }
    assert(e2.getMessage.contains("forbidden_zero_bit"))
    // slice NALs with no SPS in front
    val slicesOnly = java.util.Arrays.copyOfRange(p,
      // skip the SPS+PPS: find the third start code
      3 + H264Codec.nalUnits(p).take(2).map(_._2.length + 3).sum + 1, p.length)
    val e3 = intercept[IllegalArgumentException] {
      H264Codec.info(Array[Byte](0, 0, 1) ++ slicesOnly)
    }
    assert(e3.getMessage.contains("SPS") || e3.getMessage.contains("sps"))
  }

  test("I_PCM: decoded planes match the pixel law POSITIONALLY — every sample, every plane") {
    for (seed <- Seq(3L, 8L, 21L)) {
      val (wMb, hMb) = (2 + (seed % 5).toInt, 1 + (seed % 2).toInt)
      val p = H264Codec.synthPcm(seed, 2, wMb, hMb)
      val nals = H264Codec.nalUnits(p).toVector
      val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
      // frame 1 (not 0): the frame index must reach the law
      val slice = nals.collect { case (5, n) => n }(1)
      val fr = H264Codec.decodeIPcmSlice(slice, sps)
      assert(fr.width === wMb * 16 && fr.height === hMb * 16)
      for (mb <- 0 until wMb * hMb; pix <- 0 until 256) {
        val (mx, my) = (mb % wMb, mb / wMb)
        val at = (my * 16 + pix / 16) * fr.width + mx * 16 + pix % 16
        assert((fr.luma(at) & 0xff) === H264Codec.pcmLuma(seed, 1, mb, pix),
          s"seed $seed luma mb $mb pix $pix")
      }
      for (mb <- 0 until wMb * hMb; c <- 0 until 128) {
        val (mx, my) = (mb % wMb, mb / wMb)
        val k = c % 64
        val at = (my * 8 + k / 8) * (fr.width / 2) + mx * 8 + k % 8
        val plane = if (c < 64) fr.cb else fr.cr
        assert((plane(at) & 0xff) === H264Codec.pcmChroma(seed, 1, mb, c),
          s"seed $seed chroma mb $mb c $c")
      }
      // structural faces agree on the PCM stream too
      val v = H264Codec.info(p)
      assert(v.nFrames === 2 && v.nIdr === 2)
    }
  }

  test("I_PCM decoder refuses entropy-coded macroblocks BY NAME — the declared stub boundary") {
    val compressed = H264Codec.synth(9L, 3, 3, 2)
    val nals = H264Codec.nalUnits(compressed).toVector
    val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
    val e = intercept[IllegalArgumentException] {
      H264Codec.decodeIPcmSlice(nals.collectFirst { case (5, n) => n }.get, sps)
    }
    assert(e.getMessage.contains("entropy-coded") || e.getMessage.contains("I_PCM")
      || e.getMessage.contains("I slice"))
  }

  test("mutation fuzz: corrupt streams parse or fail with a NAMED error, never a raw index crash") {
    val rnd = new scala.util.Random(8191)
    val base = H264Codec.synth(5L, 12, 5, 4, 1, 1)
    var named = 0
    for (_ <- 1 to 400) {
      val p = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      try { H264Codec.info(p); () }
      catch {
        // the require(...) discipline — anything else (AIOOBE, negative
        // size) fails this test by propagating
        case _: IllegalArgumentException => named += 1
      }
    }
    assert(named > 0, "the sweep must hit at least some loud failures")
  }

  test("PCM mutation fuzz: the pixel DECODER is fail-loud too — corrupt SPS/slice bytes never crash raw") {
    val rnd = new scala.util.Random(4099)
    val base = H264Codec.synthPcm(6L, 2, 3, 2)
    var named = 0
    for (_ <- 1 to 300) {
      val p = base.clone()
      // bias toward the structural head (SPS/PPS/slice header bytes):
      // a flipped raster field must fail the plausibility gate, not
      // allocate garbage planes
      for (_ <- 0 to rnd.nextInt(3)) {
        val at = if (rnd.nextBoolean()) rnd.nextInt(math.min(64, p.length))
                 else rnd.nextInt(p.length)
        p(at) = rnd.nextInt(256).toByte
      }
      try {
        val nals = H264Codec.nalUnits(p).toVector
        for (sps <- nals.collectFirst { case (7, n) => H264Codec.parseSps(n) };
             slice <- nals.collectFirst { case (5, n) => n })
          H264Codec.decodeIPcmSlice(slice, sps)
      } catch {
        case _: IllegalArgumentException => named += 1
      }
    }
    assert(named > 0, "the sweep must hit at least some loud failures")
  }

  test("frameSample over the H.264 media table: real AU digests, ceil(n/every) rows per video") {
    val df = MultimodalOps.frameSampleOf(spark,
      MultimodalOps.h264MediaTable(spark, sf), every = 10).toDF()
    val counts = df.groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(counts.nonEmpty)
    counts.foreach { case (id, n) =>
      val expected = (20 + id % 30 + 9) / 10 // ceil(nFrames / 10)
      assert(n === expected, s"doc $id")
    }
    // cross-check one doc's digests against the codec walked directly
    val id = counts.keySet.min
    val direct = H264Codec.sampledAccessUnits(
      H264Codec.synth(id, 20 + (id % 30).toInt, 4 + (id % 8).toInt,
        3 + (id % 5).toInt, (id % 3).toInt, (id % 2).toInt), 10)
      .map { case (i, nal) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        (i, md.digest(nal).map("%02x".format(_)).mkString)
      }.toVector
    val fromDf = df.filter(col("doc_id") === id)
      .orderBy("frame_idx")
      .select("frame_idx", "frame_md5").collect()
      .map(r => (r.getInt(0), r.getString(1))).toVector
    assert(fromDf === direct)
  }
}
