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

  test("REVERSE direction: JDK-encoded BMP/PNG/GIF/WAV streams decode under OUR decoders") {
    import graft.ops.{BmpCodec, GifCodec, PngCodec, WavCodec}
    // a colorful truecolor raster (forces 24-bit output from the writers)
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = y * w + x
      img.setRGB(x, y, ((p * 131 % 256) << 16) | ((p * 97 % 256) << 8) | (p * 41 % 256))
    }
    def write(fmt: String, im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"JDK cannot write $fmt")
      bos.toByteArray
    }
    val wantRgb = (0 until w * h).map { p =>
      (p * 131 % 256, p * 97 % 256, p * 41 % 256)
    }
    // BMP: JDK writes 24-bit BI_RGB — our chunk walker must accept it
    val bmp = BmpCodec.decode(write("bmp", img))
    assert((bmp.width, bmp.height) === ((w, h)))
    assert((0 until w * h).map(p => (bmp.rgb(3 * p) & 0xff,
      bmp.rgb(3 * p + 1) & 0xff, bmp.rgb(3 * p + 2) & 0xff)) === wantRgb, "JDK BMP drift")
    // PNG: JDK writes 8-bit truecolor with its own filter choices — our
    // inflate+unfilter must recover the exact raster
    val png = PngCodec.decode(write("png", img))
    assert((png.width, png.height) === ((w, h)))
    assert((0 until w * h).map(p => (png.rgb(3 * p) & 0xff,
      png.rgb(3 * p + 1) & 0xff, png.rgb(3 * p + 2) & 0xff)) === wantRgb, "JDK PNG drift")
    // GIF: JDK writes its own LZW stream over an indexed image — our
    // decoder must recover the palette-mapped raster
    val pal = GifCodec.synthPalette()
    val cm = new java.awt.image.IndexColorModel(8, 64,
      Array.tabulate[Byte](64)(j => pal(3 * j)),
      Array.tabulate[Byte](64)(j => pal(3 * j + 1)),
      Array.tabulate[Byte](64)(j => pal(3 * j + 2)))
    val gi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val idx = GifCodec.synthIndexes(5, 0, w * h)
    gi.getRaster.setDataElements(0, 0, w, h, idx)
    val gif = GifCodec.decode(write("gif", gi))
    assert((gif.width, gif.height) === ((w, h)))
    val mineRgb = GifCodec.toRgb(gif.palette, gif.frames.head.indexes)
    val wantGif = GifCodec.toRgb(pal, idx)
    assert(mineRgb.toSeq === wantGif.toSeq, "JDK GIF drift")
    // WAV: javax.sound writes the RIFF container — our walker reads it
    val samples = WavCodec.synthSamples(seed = 4, n = 777)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val wos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wos)
    val wav = WavCodec.decode(wos.toByteArray)
    assert(wav.sampleRate === 16000)
    assert(wav.samples.toSeq === samples.toSeq, "JDK WAV drift")
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
