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

  test("BmpCodec: encode∘decode round-trips pixels exactly, padding and both row orders handled") {
    import graft.ops.BmpCodec
    // width 17 → 51 pixel bytes/row, padded to 52: the padding path is live
    val img = BmpCodec.decode(BmpCodec.synth(seed = 7, width = 17, height = 9))
    assert(img.width === 17 && img.height === 9)
    val round = BmpCodec.decode(BmpCodec.encode(img))
    assert(round.width === img.width && round.height === img.height)
    assert(round.rgb.toSeq === img.rgb.toSeq)
    // top-down form (negative height in the header) decodes to the same
    // normalized raster as the bottom-up encode of the same pixels
    val enc = BmpCodec.encode(img)
    val topDown = enc.clone()
    val rowBytes = (17 * 3 + 3) & ~3
    // negate height at offset 22 (little-endian int32)
    val nh = -9
    topDown(22) = nh.toByte; topDown(23) = (nh >> 8).toByte
    topDown(24) = (nh >> 16).toByte; topDown(25) = (nh >> 24).toByte
    // flip the stored rows so the pixel content matches the new order flag
    for (y <- 0 until 9; b <- 0 until rowBytes)
      topDown(54 + y * rowBytes + b) = enc(54 + (9 - 1 - y) * rowBytes + b)
    val td = BmpCodec.decode(topDown)
    assert(td.rgb.toSeq === img.rgb.toSeq)
    // non-BMP bytes are rejected, not misparsed
    assert(!BmpCodec.isBmp("not a bitmap at all, just text".getBytes))
    intercept[IllegalArgumentException](BmpCodec.decode(new Array[Byte](100)))
  }

  test("BmpCodec: nearest-neighbor resize has exact geometry; identity resize is a no-op; embed is bounded") {
    import graft.ops.BmpCodec
    val img = BmpCodec.decode(BmpCodec.synth(seed = 42, width = 20, height = 12))
    assert(BmpCodec.resizeNearest(img, 20, 12).rgb.toSeq === img.rgb.toSeq)
    val small = BmpCodec.resizeNearest(img, 5, 3)
    assert(small.width === 5 && small.height === 3 && small.rgb.length === 45)
    // nearest mapping: out(x,y) = in(x*w/tw, y*h/th) — spot-check corners
    def px(i: BmpCodec.Image, x: Int, y: Int) =
      (0 until 3).map(c => i.rgb((y * i.width + x) * 3 + c))
    assert(px(small, 0, 0) === px(img, 0, 0))
    assert(px(small, 4, 2) === px(img, 4 * 20 / 5, 2 * 12 / 3))
    val emb = BmpCodec.pixelEmbed(img)
    assert(emb.length === 64 && emb.forall(v => v >= -1.0 && v <= 1.0))
    // solid black/white rasters hit the normalization endpoints exactly
    val black = BmpCodec.Image(4, 4, new Array[Byte](48))
    assert(BmpCodec.pixelEmbed(black).forall(_ === -1.0))
    val white = BmpCodec.Image(4, 4, Array.fill[Byte](48)(0xff.toByte))
    assert(BmpCodec.pixelEmbed(white).forall(_ === 1.0))
  }

  test("real BMP path end-to-end: ingest real rasters → real decode dims → real resize → pixel embedding") {
    import graft.ops.BmpCodec
    val media = MultimodalOps.bmpMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
    val images = decoded.filter(_.media_type == "image")
    assert(images.nonEmpty)
    // decode reports the REAL synthesized geometry, not a hash-derived fake
    images.foreach { m =>
      assert(m.width === 16 + (m.doc_id % 48).toInt)
      assert(m.height === 16 + (m.doc_id % 32).toInt)
    }
    // resize: every image payload is a real BMP of exactly the target shape
    val resized = MultimodalOps.resizeStageOf(spark, media, 32, 32).collect()
      .filter(_.media_type == "image")
    resized.foreach { r =>
      val img = BmpCodec.decode(r.payload)
      assert(img.width === 32 && img.height === 32)
    }
    // payload → pixels → embedding: self-similarity 1, cross-similarity < 1
    val bySeed = images.take(2).map { m =>
      BmpCodec.pixelEmbed(BmpCodec.decode(
        BmpCodec.synth(m.doc_id, m.width, m.height)))
    }
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(cos(bySeed(0), bySeed(0)) - 1.0) < 1e-12)
    assert(cos(bySeed(0), bySeed(1)) < 0.999)
  }

  test("WavCodec: encode∘decode round-trips samples and rate; chunk walker skips junk; rejects non-WAV") {
    import graft.ops.WavCodec
    val a = WavCodec.Audio(11025, WavCodec.synthSamples(seed = 3, n = 333))
    val round = WavCodec.decode(WavCodec.encode(a))
    assert(round.sampleRate === a.sampleRate)
    assert(round.samples.toSeq === a.samples.toSeq)
    // hand-build a file with an odd-sized junk chunk BEFORE fmt/data: the
    // walker must skip it plus its RIFF pad byte (the hardcode-byte-44 trap)
    val canon = WavCodec.encode(a)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0) // size 5 + pad
    val withJunk = new Array[Byte](12 + junk.length + (canon.length - 12))
    System.arraycopy(canon, 0, withJunk, 0, 12)
    System.arraycopy(junk, 0, withJunk, 12, junk.length)
    System.arraycopy(canon, 12, withJunk, 12 + junk.length, canon.length - 12)
    val walked = WavCodec.decode(withJunk)
    assert(walked.sampleRate === a.sampleRate && walked.samples.toSeq === a.samples.toSeq)
    assert(!WavCodec.isWav("RIFFnot really a wave file, just text".getBytes))
    intercept[IllegalArgumentException](WavCodec.decode(new Array[Byte](100)))
  }

  test("WavCodec: resample geometry and determinism; embed hits normalization endpoints") {
    import graft.ops.WavCodec
    val a = WavCodec.Audio(16000, WavCodec.synthSamples(seed = 9, n = 1600))
    assert(WavCodec.resampleNearest(a, 16000).samples.toSeq === a.samples.toSeq)
    val down = WavCodec.resampleNearest(a, 8000)
    assert(down.sampleRate === 8000 && down.samples.length === 800)
    // nearest mapping: out(i) = in(i*from/to) — spot-check
    assert(down.samples(10) === a.samples(20))
    val up = WavCodec.resampleNearest(a, 32000)
    assert(up.samples.length === 3200 && up.samples(7) === a.samples(3))
    val emb = WavCodec.sampleEmbed(a)
    assert(emb.length === 64 && emb.forall(v => v >= -1.0 && v <= 1.0))
    assert(WavCodec.sampleEmbed(WavCodec.Audio(8000, new Array[Short](256)))
      .forall(_ === -1.0))
    assert(WavCodec.sampleEmbed(WavCodec.Audio(8000, Array.fill[Short](256)(Short.MaxValue)))
      .forall(_ === 1.0))
  }

  test("real WAV path end-to-end: ingest real PCM → real header rate/length → law-checked features") {
    import graft.ops.WavCodec
    val media = MultimodalOps.wavMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
      .filter(_.media_type == "audio")
    assert(decoded.nonEmpty)
    // decode reports the REAL synthesized rate/length parsed from the
    // RIFF header, not a hash-derived fake
    decoded.foreach { m =>
      assert(m.sample_rate === 8000 + (m.doc_id % 4).toInt * 2000)
      assert(m.n_frames === 512 + (m.doc_id % 512).toInt)
    }
    // features: recompute one doc straight from the sample law and match
    // the through-the-codec result field for field
    val feats = MultimodalOps.audioFeatures(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val id = decoded.head.doc_id
    val n = 512 + (id % 512).toInt
    val law = Array.tabulate(n)(i => (id * 131 + i.toLong * 773) % 4001 - 2000)
    val r = feats(id)
    assert(r.getAs[Int]("n_samples") === n)
    assert(r.getAs[Long]("sum_sq") === law.map(v => v * v).sum)
    assert(r.getAs[Long]("zero_cross") ===
      law.sliding(2).count(p => p(0) * p(1) < 0).toLong)
    assert(r.getAs[Int]("peak") === law.map(math.abs).max.toInt)
    assert(r.getAs[Long]("duration_ms") ===
      n.toLong * 1000L / (8000 + (id % 4).toInt * 2000))
  }

  test("FlacCodec: encode∘decode is the identity across block shapes, extremes, and subframe types") {
    import graft.ops.FlacCodec
    // lengths straddle the 4096 block: single sample, partial, exact,
    // multi-frame with partial tail
    for (n <- Seq(1, 5, 511, 4096, 4097, 9001)) {
      val a = FlacCodec.Audio(22050, FlacCodec.synthSamples(seed = 7, n = n))
      val round = FlacCodec.decode(FlacCodec.encode(a))
      assert(round.sampleRate === a.sampleRate, s"rate at n=$n")
      assert(round.samples.toSeq === a.samples.toSeq, s"samples at n=$n")
    }
    // CONSTANT subframe: an all-equal block takes that arm and round-trips
    val const = FlacCodec.Audio(8000, Array.fill[Short](5000)(-123))
    assert(FlacCodec.decode(FlacCodec.encode(const)).samples.toSeq === const.samples.toSeq)
    // hostile extremes: full 16-bit range, alternating (max order-1 residuals)
    val rnd = new scala.util.Random(5)
    val extreme = Array.tabulate[Short](6000) {
      case i if i % 97 == 0 => Short.MinValue
      case i if i % 89 == 0 => Short.MaxValue
      case _                => (rnd.nextInt(65536) - 32768).toShort
    }
    val ea = FlacCodec.Audio(48000, extreme)
    assert(FlacCodec.decode(FlacCodec.encode(ea)).samples.toSeq === extreme.toSeq)
    // the law samples must genuinely COMPRESS (predictor+Rice beats raw)
    val law = FlacCodec.Audio(16000, FlacCodec.synthSamples(seed = 11, n = 2048))
    assert(FlacCodec.encode(law).length < 2 * law.samples.length,
      "fixed-predictor Rice coding must beat the raw 16-bit stream on the sample law")
  }

  test("FlacCodec: integrity chain trips on corruption; unknown metadata blocks walk through") {
    import graft.ops.FlacCodec
    val a = FlacCodec.Audio(16000, FlacCodec.synthSamples(seed = 21, n = 1000))
    val enc = FlacCodec.encode(a)
    // a PADDING metadata block (type 1) spliced before frames is walked over
    val siEnd = 4 + 4 + 34 // magic + STREAMINFO header + body
    val pad = Array[Byte](1, 0, 0, 3, 0, 0, 0) // type 1, len 3 (last flag on STREAMINFO cleared)
    val spliced = new Array[Byte](enc.length + pad.length)
    System.arraycopy(enc, 0, spliced, 0, siEnd)
    System.arraycopy(pad, 0, spliced, siEnd, pad.length)
    System.arraycopy(enc, siEnd, spliced, siEnd + pad.length, enc.length - siEnd)
    spliced(4) = (spliced(4) & 0x7f).toByte // STREAMINFO no longer last
    spliced(siEnd) = (spliced(siEnd) | 0x80).toByte // padding block is last
    val walked = FlacCodec.decode(spliced)
    assert(walked.samples.toSeq === a.samples.toSeq)
    // flip one payload byte mid-frame: CRC-16 (or the MD5) must trip
    val corrupt = enc.clone()
    corrupt(enc.length - 40) = (corrupt(enc.length - 40) ^ 0x40).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(corrupt))
    // flip a frame-header byte: CRC-8 must trip
    val hdrCorrupt = enc.clone()
    hdrCorrupt(siEnd + 2) = (hdrCorrupt(siEnd + 2) ^ 0x01).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(hdrCorrupt))
    // truncation and non-FLAC payloads reject loudly
    intercept[IllegalArgumentException](FlacCodec.decode(
      java.util.Arrays.copyOf(enc, enc.length - 3)))
    intercept[IllegalArgumentException](FlacCodec.decode(new Array[Byte](100)))
    assert(!FlacCodec.isFlac("fLaCnot actually a flac stream".getBytes.take(3)))
  }

  test("real FLAC path end-to-end: ingest compressed audio → real decode → law-checked features") {
    val media = MultimodalOps.flacMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
      .filter(_.media_type == "audio")
    assert(decoded.nonEmpty)
    // decodeMedia dispatches on the fLaC magic and reports the REAL
    // STREAMINFO rate/length, not a hash-derived fake
    decoded.foreach { m =>
      assert(m.sample_rate === 8000 + (m.doc_id % 4).toInt * 2000)
      assert(m.n_frames === 512 + (m.doc_id % 512).toInt)
    }
    val feats = MultimodalOps.flacAudioFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach(r => assert(r.getAs[Boolean]("compressed"),
      s"doc ${r.getAs[Long]("doc_id")} did not compress"))
    val id = decoded.head.doc_id
    val n = 512 + (id % 512).toInt
    val law = Array.tabulate(n)(i => (id * 241 + i.toLong * 661) % 4001 - 2000)
    val r = feats.map(x => x.getAs[Long]("doc_id") -> x).toMap.apply(id)
    assert(r.getAs[Int]("n_samples") === n)
    assert(r.getAs[Long]("sum_sq") === law.map(v => v * v).sum)
    assert(r.getAs[Long]("zero_cross") ===
      law.sliding(2).count(p => p(0) * p(1) < 0).toLong)
    assert(r.getAs[Int]("peak") === law.map(math.abs).max.toInt)
  }

  test("GifCodec: encode∘decode is the identity across frame counts, dims, palettes, and the 4096-dict reset") {
    import graft.ops.GifCodec
    for ((nf, w, h) <- Seq((1, 1, 1), (3, 24, 15), (12, 31, 17), (9, 64, 48))) {
      val enc = GifCodec.synth(seed = 7, nFrames = nf, width = w, height = h)
      val g = GifCodec.decode(enc)
      assert((g.width, g.height, g.frames.length) === ((w, h, nf)))
      assert(g.palette.toSeq === GifCodec.synthPalette().toSeq)
      for (i <- 0 until nf) {
        assert(g.frames(i).delayCs === 4 + (i % 6), s"delay at frame $i")
        assert(g.frames(i).indexes.toSeq ===
          GifCodec.synthIndexes(7, i, w * h).toSeq, s"pixels at frame $i")
      }
    }
    // incompressible 256-entry-palette raster big enough to overflow the
    // 4096-code dictionary: exercises the CLEAR-and-reset arm both ways
    val rnd = new scala.util.Random(3)
    val pal256 = Array.tabulate[Byte](256 * 3)(k => ((k * 89) % 256).toByte)
    val noisy = Array.fill[Byte](128 * 128)(rnd.nextInt(256).toByte)
    val big = GifCodec.Gif(128, 128, pal256,
      IndexedSeq(GifCodec.GifFrame(10, noisy)))
    val round = GifCodec.decode(GifCodec.encode(big))
    assert(round.frames.head.indexes.toSeq === noisy.toSeq)
    // constant frame (single dict chain) and the stride law must COMPRESS:
    // whole payload under 1 byte/pixel, headers included
    val law = GifCodec.synth(seed = 11, nFrames = 10, width = 24, height = 15)
    assert(law.length < 10 * 24 * 15,
      "LZW must beat 1 byte/pixel on the period-64 stride law")
    val const = GifCodec.Gif(40, 30, GifCodec.synthPalette(),
      IndexedSeq(GifCodec.GifFrame(0, new Array[Byte](1200))))
    assert(GifCodec.decode(GifCodec.encode(const)).frames.head.indexes.forall(_ == 0))
    // 2-entry palette: gctBits 1 but LZW roots floored at min code size 2
    val bw = Array.tabulate[Byte](77)(p => (p % 2).toByte)
    val tiny = GifCodec.decode(GifCodec.encode(GifCodec.Gif(7, 11,
      Array[Byte](0, 0, 0, -1, -1, -1), IndexedSeq(GifCodec.GifFrame(2, bw)))))
    assert(tiny.palette.length === 6)
    assert(tiny.frames.head.indexes.toSeq === bw.toSeq)
  }

  test("GifCodec: structural validation trips loudly; foreign extensions walk through") {
    import graft.ops.GifCodec
    val enc = GifCodec.synth(seed = 21, nFrames = 5, width = 24, height = 15)
    val g = GifCodec.decode(enc)
    // a comment extension spliced after the color table is walked over
    val gctEnd = 13 + 64 * 3
    val comment = Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)
    val spliced = new Array[Byte](enc.length + comment.length)
    System.arraycopy(enc, 0, spliced, 0, gctEnd)
    System.arraycopy(comment, 0, spliced, gctEnd, comment.length)
    System.arraycopy(enc, gctEnd, spliced, gctEnd + comment.length, enc.length - gctEnd)
    assert(GifCodec.decode(spliced).frames.length === 5)
    // truncation, missing trailer, unknown blocks, unsupported features
    intercept[IllegalArgumentException](GifCodec.decode(
      java.util.Arrays.copyOf(enc, enc.length - 2)))
    intercept[IllegalArgumentException](GifCodec.decode(
      java.util.Arrays.copyOf(enc, 10)))
    intercept[IllegalArgumentException](GifCodec.decode(new Array[Byte](50)))
    val badBlock = enc.clone(); badBlock(gctEnd) = 0x55
    intercept[IllegalArgumentException](GifCodec.decode(badBlock))
    // set the LOCAL-color-table flag on the first image descriptor (it
    // directly follows the first frame's 8-byte GCE): outside the profile
    val lct = enc.clone()
    val idPacked = gctEnd + 8 + 9
    assert((lct(gctEnd + 8) & 0xff) === 0x2c, "fixture drift: descriptor offset")
    lct(idPacked) = (lct(idPacked) | 0x80).toByte
    intercept[IllegalArgumentException](GifCodec.decode(lct))
    // the INTERLACE flag, by contrast, is supported: flipping it on a
    // sequentially-written stream decodes to exactly the 4-pass row
    // permutation of the original frame
    val il = enc.clone()
    il(idPacked) = (il(idPacked) | 0x40).toByte
    val straight = GifCodec.decode(enc).frames.head.indexes
    val permuted = GifCodec.decode(il).frames.head.indexes
    val w0 = 24; val h0 = 15
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
      .flatMap { case (s, st) => s until h0 by st }
    for ((destY, srcY) <- passes.zipWithIndex) {
      assert(permuted.slice(destY * w0, destY * w0 + w0).toSeq ===
        straight.slice(srcY * w0, srcY * w0 + w0).toSeq, s"row $destY")
    }
    // GIF carries no checksums: corruption shows up structurally — chop a
    // frame's final data sub-block terminator into a bogus length
    assert(!GifCodec.isGif("GIF10x".getBytes))
    // encoder refuses out-of-palette indexes and non-power-of-two palettes
    intercept[IllegalArgumentException](GifCodec.encode(GifCodec.Gif(
      2, 1, GifCodec.synthPalette(), IndexedSeq(GifCodec.GifFrame(0, Array[Byte](1, 80))))))
    intercept[IllegalArgumentException](GifCodec.encode(GifCodec.Gif(
      1, 1, new Array[Byte](9), IndexedSeq(GifCodec.GifFrame(0, Array[Byte](0))))))
  }

  test("GifCodec: lazy sampling decompresses only the selected frames and matches the eager decode") {
    import graft.ops.GifCodec
    val enc = GifCodec.synth(seed = 33, nFrames = 11, width = 24, height = 15)
    val eager = GifCodec.decode(enc)
    val sampled = GifCodec.sampledIndexFrames(enc, 4).toSeq
    assert(sampled.map(_._1) === Seq(0, 4, 8))
    for ((i, d, px) <- sampled) {
      assert(d === eager.frames(i).delayCs)
      assert(px.toSeq === eager.frames(i).indexes.toSeq)
    }
    val rgb = GifCodec.sampledRgbFrames(enc, 4).toSeq
    assert(rgb.map(_._1) === Seq(0, 4, 8))
    assert(rgb.head._3.toSeq ===
      GifCodec.toRgb(eager.palette, eager.frames.head.indexes).toSeq)
  }

  test("real GIF path end-to-end: ingest animated GIFs → real decode → law-checked frame features") {
    val media = MultimodalOps.gifMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
      .filter(_.media_type == "video")
    assert(decoded.nonEmpty)
    // decodeMedia dispatches on the GIF magic and reports the REAL
    // screen descriptor dims and frame count, not a hash-derived fake
    decoded.foreach { m =>
      assert(m.width === 24 + (m.doc_id % 8).toInt)
      assert(m.height === 15 + (m.doc_id % 8).toInt)
      assert(m.n_frames === 8 + (m.doc_id % 10).toInt)
    }
    val feats = MultimodalOps.gifFrameFeatures(spark, sf).collect()
    val id = decoded.head.doc_id
    val w = 24 + (id % 8).toInt; val h = 15 + (id % 8).toInt
    val mine = feats.filter(_.getAs[Long]("doc_id") == id)
      .sortBy(_.getAs[Int]("frame_idx"))
    assert(mine.map(_.getAs[Int]("frame_idx")).toSeq ===
      (0 until 8 + (id % 10).toInt by 3).toSeq)
    for (r <- mine) {
      val i = r.getAs[Int]("frame_idx")
      val idx = Array.tabulate(w * h)(p => ((id * 131 + i * 977 + p * 37) % 64).toInt)
      assert(r.getAs[Int]("delay_cs") === 4 + (i % 6))
      assert(r.getAs[Long]("sum_r") === idx.map(j => (j * 41) % 256).foldLeft(0L)(_ + _))
      assert(r.getAs[Long]("sum_g") === idx.map(j => (j * 97) % 256).foldLeft(0L)(_ + _))
      assert(r.getAs[Long]("sum_b") === idx.map(j => (j * 163) % 256).foldLeft(0L)(_ + _))
    }
  }

  test("generic stages dispatch GIF for real: resize scales every frame in index space; frameSample digests real decoded frames") {
    import graft.ops.GifCodec
    val media = MultimodalOps.gifMediaTable(spark, sf)
    val one = MultimodalOps.resizeStageOf(spark, media, 12, 8).collect()
      .filter(_.media_type == "video")
    assert(one.nonEmpty)
    for (r <- one.take(3)) {
      val g = GifCodec.decode(r.payload)
      assert((g.width, g.height) === ((12, 8)))
      val id = r.doc_id
      val srcW = 24 + (id % 8).toInt; val srcH = 15 + (id % 8).toInt
      assert(g.frames.length === 8 + (id % 10).toInt, "resize must keep every frame")
      // nearest-neighbor integer mapping replayed straight from the law
      for (i <- Seq(0, g.frames.length - 1); y <- 0 until 8; x <- 0 until 12) {
        val sx = x.toLong * srcW / 12; val sy = y.toLong * srcH / 8
        val want = ((id * 131 + i * 977 + (sy * srcW + sx) * 37) % 64).toByte
        assert(g.frames(i).indexes(y * 12 + x) === want, s"doc $id frame $i ($x,$y)")
      }
      assert(g.frames.head.delayCs === 4, "delays survive the resize")
    }
    val every = 4
    val frames = MultimodalOps.frameSampleOf(spark, media, every).collect()
    val id = one.head.doc_id
    val nf = 8 + (id % 10).toInt
    val mine = frames.filter(_.doc_id == id).sortBy(_.frame_idx)
    assert(mine.map(_.frame_idx).toSeq === (0 until nf by every).toSeq)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (f <- mine) {
      val px = GifCodec.synthIndexes(id, f.frame_idx,
        (24 + (id % 8).toInt) * (15 + (id % 8).toInt))
      md.reset()
      assert(f.frame_md5 === md.digest(px).map("%02x".format(_)).mkString,
        s"frame ${f.frame_idx} digest must be the REAL decoded pixels")
      assert(f.byte_len === px.length.toLong)
    }
  }

  test("real WebP path end-to-end: ingest VP8L images → real decode → law-checked features; resize round-trips") {
    import graft.ops.WebpCodec
    val media = MultimodalOps.webpMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
      .filter(_.media_type == "image")
    assert(decoded.nonEmpty)
    decoded.foreach { m =>
      assert(m.width === 21 + (m.doc_id % 13).toInt)
      assert(m.height === 14 + (m.doc_id % 11).toInt)
    }
    val feats = MultimodalOps.webpImageFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach(r => assert(r.getAs[Boolean]("compressed"),
      s"doc ${r.getAs[Long]("doc_id")} did not compress"))
    val id = decoded.head.doc_id
    val w = 21 + (id % 13).toInt; val h = 14 + (id % 11).toInt
    val base = Array.tabulate(w * h)(p => ((id * 149 + ((p * 37) % 64) * 3) % 256).toInt)
    val r = feats.map(x => x.getAs[Long]("doc_id") -> x).toMap.apply(id)
    assert(r.getAs[Long]("sum_r") === base.foldLeft(0L)(_ + _))
    assert(r.getAs[Long]("sum_g") === base.foldLeft(0L)((a, x) => a + (x + 97) % 256))
    assert(r.getAs[Long]("sum_b") === base.foldLeft(0L)((a, x) => a + (x + 194) % 256))
    // the generic resize stage dispatches VP8L: re-encoded at target dims,
    // nearest-neighbor law replayed
    val one = MultimodalOps.resizeStageOf(spark, media, 9, 6).collect()
      .filter(_.media_type == "image").head
    val img = WebpCodec.decode(one.payload)
    assert((img.width, img.height) === ((9, 6)))
    val srcW = 21 + (one.doc_id % 13).toInt; val srcH = 14 + (one.doc_id % 11).toInt
    val full = WebpCodec.synthArgb(one.doc_id, srcW, srcH)
    for (y <- 0 until 6; x <- 0 until 9) {
      val sx = (x.toLong * srcW / 9).toInt; val sy = (y.toLong * srcH / 6).toInt
      assert(img.argb(y * 9 + x) === full.argb(sy * srcW + sx), s"(${x},${y})")
    }
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

  test("AviCodec: encode∘decode round-trips frames and header; junk chunks and pad bytes survive") {
    import graft.ops.AviCodec
    val a = AviCodec.Avi(64, 48, 33366,
      IndexedSeq.tabulate(7)(AviCodec.synthFrame(11L, _)))
    val round = AviCodec.decode(AviCodec.encode(a))
    assert(round.width === 64 && round.height === 48 && round.microSecPerFrame === 33366)
    assert(round.frames.length === 7)
    round.frames.zip(a.frames).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
    // splice a JUNK chunk between the two LISTs: the walker must skip it
    val enc = AviCodec.encode(a)
    val hdrlEnd = 12 + 8 + 4 + 8 + 56 // RIFF hdr + LIST(hdrl){avih}
    val junk = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 9, 9, 9, 0) // size 3 + pad
    val spliced = new Array[Byte](enc.length + junk.length)
    System.arraycopy(enc, 0, spliced, 0, hdrlEnd)
    System.arraycopy(junk, 0, spliced, hdrlEnd, junk.length)
    System.arraycopy(enc, hdrlEnd, spliced, hdrlEnd + junk.length, enc.length - hdrlEnd)
    // fix the RIFF size field for the inserted bytes
    val newRiff = spliced.length - 8
    spliced(4) = newRiff.toByte; spliced(5) = (newRiff >> 8).toByte
    spliced(6) = (newRiff >> 16).toByte; spliced(7) = (newRiff >> 24).toByte
    val walked = AviCodec.decode(spliced)
    assert(walked.frames.length === 7)
    walked.frames.zip(a.frames).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
    assert(!AviCodec.isAvi("RIFFxxxxWAVE and then some".getBytes))
    intercept[IllegalArgumentException](AviCodec.decode(new Array[Byte](64)))
  }

  test("AviCodec.sampledFrames: lazy walk yields exactly the k-grid with real bytes") {
    import graft.ops.AviCodec
    val bytes = AviCodec.synth(seed = 5L, nFrames = 23)
    val sampled = AviCodec.sampledFrames(bytes, every = 7).toSeq
    assert(sampled.map(_._1) === Seq(0, 7, 14, 21))
    sampled.foreach { case (i, fb) =>
      assert(fb.toSeq === AviCodec.synthFrame(5L, i).toSeq)
    }
  }

  test("real AVI path end-to-end: ingest real containers → real header geometry → law-checked frame digests") {
    val media = MultimodalOps.aviMediaTable(spark, sf)
    val decoded = MultimodalOps.decodeMediaOf(spark, media).collect()
      .filter(_.media_type == "video")
    assert(decoded.nonEmpty)
    decoded.foreach { m =>
      assert(m.width === 64 + (m.doc_id % 32).toInt)
      assert(m.height === 48 + (m.doc_id % 16).toInt)
      assert(m.n_frames === 30 + (m.doc_id % 60).toInt)
    }
    val frames = MultimodalOps.frameSampleAvi(spark, sf).collect()
    val expected = decoded.map(v => (v.n_frames + 9) / 10).sum
    assert(frames.length === expected)
    // one doc's digests recomputed straight from the law
    val id = decoded.head.doc_id
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.filter(_.getAs[Long]("doc_id") == id).foreach { r =>
      md.reset()
      val law = graft.ops.AviCodec.synthFrame(id, r.getAs[Int]("frame_idx"))
      val hex = md.digest(law).map("%02x".format(_)).mkString
      assert(r.getAs[String]("frame_md5") === hex)
      assert(r.getAs[Long]("byte_len") === law.length.toLong)
    }
  }
}
