package graft

import org.apache.spark.sql.functions._

/** DIFFERENTIAL conformance: every lossless image/audio stream this tier's
  * encoders emit must decode IDENTICALLY under the JDK's own, independently
  * implemented decoders (`javax.imageio` for BMP/PNG/GIF/JPEG,
  * `javax.sound.sampled` for WAV) — a spec-legality proof no amount of
  * self-round-tripping gives: if the encoder and decoder shared a
  * misreading of the format, the round trip would still pass, but ImageIO
  * would not. FLAC has no JDK decoder; its conformance rests on the
  * CRC-8/CRC-16/MD5 integrity chain plus the oracle-law gate.
  */
class CodecConformanceSpec extends SparkSpecBase {

  private def argb(img: java.awt.image.BufferedImage): Array[Int] = {
    val out = new Array[Int](img.getWidth * img.getHeight)
    img.getRGB(0, 0, img.getWidth, img.getHeight, out, 0, img.getWidth)
    out
  }

  private def rgbTriples(px: Array[Int]): Seq[(Int, Int, Int)] =
    px.toSeq.map(v => ((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff))

  private def readOne(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the stream outright")
    img
  }

  test("BMP: ImageIO decodes our encoder's stream to the exact synth raster") {
    import graft.ops.BmpCodec
    for (id <- Seq(0L, 5L, 41L)) {
      val bytes = BmpCodec.synth(id, 16 + (id % 48).toInt, 16 + (id % 32).toInt)
      val mine = BmpCodec.decode(bytes)
      val theirs = readOne(bytes)
      assert((theirs.getWidth, theirs.getHeight) === ((mine.width, mine.height)))
      val ours = (0 until mine.width * mine.height).map { p =>
        (mine.rgb(3 * p) & 0xff, mine.rgb(3 * p + 1) & 0xff, mine.rgb(3 * p + 2) & 0xff)
      }
      assert(rgbTriples(argb(theirs)) === ours, s"BMP pixel drift for doc $id")
    }
  }

  test("PNG: ImageIO inflates our DEFLATE+predictor stream to the exact pixel law") {
    import graft.ops.PngCodec
    for (id <- Seq(1L, 7L, 33L)) {
      val bytes = PngCodec.synth(id, 17 + (id % 31).toInt, 11 + (id % 23).toInt)
      val mine = PngCodec.decode(bytes)
      val theirs = readOne(bytes)
      assert((theirs.getWidth, theirs.getHeight) === ((mine.width, mine.height)))
      val ours = (0 until mine.width * mine.height).map { p =>
        (mine.rgb(3 * p) & 0xff, mine.rgb(3 * p + 1) & 0xff, mine.rgb(3 * p + 2) & 0xff)
      }
      assert(rgbTriples(argb(theirs)) === ours, s"PNG pixel drift for doc $id")
    }
  }

  test("GIF: ImageIO decodes every animated frame of our LZW stream bit-for-bit") {
    import graft.ops.GifCodec
    val seed = 13L
    val (nf, w, h) = (9, 25, 17)
    val bytes = GifCodec.synth(seed, nf, w, h)
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    assert(it.hasNext, "JDK gif reader missing")
    val reader = it.next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) === nf, "frame count under ImageIO")
    val pal = GifCodec.synthPalette()
    for (i <- 0 until nf) {
      val frame = reader.read(i)
      assert((frame.getWidth, frame.getHeight) === ((w, h)))
      val want = GifCodec.toRgb(pal, GifCodec.synthIndexes(seed, i, w * h))
      val ours = (0 until w * h).map { p =>
        (want(3 * p) & 0xff, want(3 * p + 1) & 0xff, want(3 * p + 2) & 0xff)
      }
      assert(rgbTriples(argb(frame)) === ours, s"GIF frame $i drift under ImageIO")
    }
    reader.dispose()
  }

  test("GIF: the 4096-dictionary reset stream survives ImageIO too") {
    import graft.ops.GifCodec
    val rnd = new scala.util.Random(9)
    val pal256 = Array.tabulate[Byte](256 * 3)(k => ((k * 89) % 256).toByte)
    val noisy = Array.fill[Byte](128 * 128)(rnd.nextInt(256).toByte)
    val bytes = GifCodec.encode(GifCodec.Gif(128, 128, pal256,
      IndexedSeq(GifCodec.GifFrame(4, noisy))))
    val theirs = argb(readOne(bytes))
    val want = GifCodec.toRgb(pal256, noisy)
    val ours = (0 until 128 * 128).map { p =>
      (want(3 * p) & 0xff, want(3 * p + 1) & 0xff, want(3 * p + 2) & 0xff)
    }
    assert(rgbTriples(theirs) === ours, "post-reset LZW drift under ImageIO")
  }

  test("JPEG: ImageIO accepts our self-describing stream; DC-constant blocks decode within JPEG's rounding envelope") {
    import graft.ops.JpegCodec
    // constant-per-block fixture: every AC is exactly zero, so the only
    // legal cross-decoder divergence is ±1 color-convert rounding
    for (id <- Seq(2L, 19L)) {
      val bytes = JpegCodec.synthDc(id, 2, 1)
      val mine = JpegCodec.decode(bytes)
      val theirs = readOne(bytes)
      assert((theirs.getWidth, theirs.getHeight) === ((mine.width, mine.height)))
      val them = rgbTriples(argb(theirs))
      var worst = 0
      for (p <- 0 until mine.width * mine.height) {
        val (tr, tg, tb) = them(p)
        worst = math.max(worst, math.abs(tr - (mine.rgb(3 * p) & 0xff)))
        worst = math.max(worst, math.abs(tg - (mine.rgb(3 * p + 1) & 0xff)))
        worst = math.max(worst, math.abs(tb - (mine.rgb(3 * p + 2) & 0xff)))
      }
      assert(worst <= 1, s"DC-constant cross-decoder divergence $worst > 1 for doc $id")
    }
  }

  test("WAV: javax.sound decodes our RIFF stream to the exact PCM samples") {
    import graft.ops.WavCodec
    for (id <- Seq(1L, 10L, 313L)) {
      val n = 512 + (id % 512).toInt
      val rate = 8000 + (id % 4).toInt * 2000
      val bytes = WavCodec.synth(id, n, rate)
      val mine = WavCodec.decode(bytes)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt === rate)
      assert(fmt.getChannels === 1)
      assert(fmt.getSampleSizeInBits === 16)
      val raw = in.readAllBytes()
      assert(raw.length === 2 * n, "sample count under javax.sound")
      val theirs = Array.tabulate(n) { i =>
        (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
      }
      assert(theirs.toSeq === mine.samples.toSeq, s"PCM drift for doc $id")
      in.close()
    }
  }
}
