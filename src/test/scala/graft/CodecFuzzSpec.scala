package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck fuzz over the round-13 codecs (GIF, WebP/VP8L, FLAC): the
  * targeted specs pin the named edge cases; these properties sweep the
  * parameter space — arbitrary dimensions, palette sizes, frame counts,
  * sample counts, and hostile value distributions — through the full
  * encode∘decode identity. Fixed seed (deterministic failures), JVM-only
  * (no Spark jobs), a few hundred round trips per property.
  */
class CodecFuzzSpec extends SparkSpecBase {

  private def samples[A](gen: Gen[A], n: Int, seed0: Long): List[A] = {
    var seed = Seed(seed0)
    val out = List.newBuilder[A]
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => out += a; i += 1 }
      seed = seed.next
    }
    out.result()
  }

  test("GIF fuzz: encode∘decode identity over random palettes, dims, frame counts, and index rasters") {
    import graft.ops.GifCodec
    val gen = for {
      palBits <- Gen.choose(1, 8)
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 30)
      nf <- Gen.choose(1, 6)
      mode <- Gen.oneOf("random", "constant", "stride")
      seed <- Gen.choose(0L, 1L << 40)
    } yield (palBits, w, h, nf, mode, seed)
    for ((palBits, w, h, nf, mode, seed) <- samples(gen, 120, 7L)) {
      val palN = 1 << palBits
      val pal = Array.tabulate[Byte](palN * 3)(k => ((k * 89 + seed % 7) % 256).toByte)
      val rnd = new scala.util.Random(seed)
      def frame(i: Int): Array[Byte] = mode match {
        case "random"   => Array.fill[Byte](w * h)((rnd.nextInt(palN) & 0xff).toByte)
        case "constant" => Array.fill[Byte](w * h)((seed % palN).toByte)
        case _          => Array.tabulate[Byte](w * h)(p => ((seed + i * 977L + p * 37L) % palN).toByte)
      }
      val frames = IndexedSeq.tabulate(nf)(i => GifCodec.GifFrame(i % 70, frame(i)))
      val g = GifCodec.Gif(w, h, pal, frames)
      val round = try GifCodec.decode(GifCodec.encode(g))
      catch {
        case e: Exception =>
          fail(s"round trip threw at palN=$palN ${w}x$h nf=$nf mode=$mode seed=$seed: $e")
      }
      assert((round.width, round.height, round.frames.length) === ((w, h, nf)),
        s"shape at palN=$palN ${w}x$h nf=$nf mode=$mode seed=$seed")
      assert(round.palette.toSeq === pal.toSeq, s"palette at seed=$seed")
      for (i <- 0 until nf) {
        assert(round.frames(i).delayCs === i % 70, s"delay $i seed=$seed")
        assert(round.frames(i).indexes.toSeq === frames(i).indexes.toSeq,
          s"pixels frame $i palN=$palN ${w}x$h mode=$mode seed=$seed")
      }
    }
  }

  test("WebP fuzz: encode∘decode identity over random dims and channel distributions incl. alpha") {
    import graft.ops.WebpCodec
    val gen = for {
      w <- Gen.choose(1, 48)
      h <- Gen.choose(1, 36)
      mode <- Gen.oneOf("random", "constant", "twovals", "skewed", "alpha")
      seed <- Gen.choose(0L, 1L << 40)
    } yield (w, h, mode, seed)
    for ((w, h, mode, seed) <- samples(gen, 120, 11L)) {
      val rnd = new scala.util.Random(seed)
      val px = mode match {
        case "random"   => Array.fill(w * h)(0xff000000 | rnd.nextInt(1 << 24))
        case "constant" => Array.fill(w * h)(0xff000000 | (seed & 0xffffff).toInt)
        case "twovals"  =>
          val a = 0xff000000 | rnd.nextInt(1 << 24)
          val b = 0xff000000 | rnd.nextInt(1 << 24)
          Array.tabulate(w * h)(p => if (p % 3 == 0) a else b)
        case "skewed"   =>
          // geometric channel values: exercises deep Huffman + Kraft repair
          Array.fill(w * h) {
            var v = 0
            while (v < 30 && rnd.nextBoolean()) v += 1
            0xff000000 | (v << 16) | (rnd.nextInt(4) << 8) | (v * 7 % 256)
          }
        case _          => Array.fill(w * h)(rnd.nextInt()) // real alpha
      }
      val img = WebpCodec.Argb(w, h, px)
      val round = WebpCodec.decode(WebpCodec.encode(img))
      assert((round.width, round.height) === ((w, h)), s"dims ${w}x$h mode=$mode seed=$seed")
      assert(round.argb.toSeq === px.toSeq, s"pixels ${w}x$h mode=$mode seed=$seed")
    }
  }

  test("BMP/PNG/WAV/AVI fuzz: exact round trips over random dims, rasters, samples, and frame shapes") {
    import graft.ops.{AviCodec, BmpCodec, PngCodec, WavCodec}
    val gen = for {
      w <- Gen.choose(1, 50)
      h <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (w, h, seed)
    for ((w, h, seed) <- samples(gen, 80, 17L)) {
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val img = BmpCodec.Image(w, h, rgb)
      assert(BmpCodec.decode(BmpCodec.encode(img)).rgb.toSeq === rgb.toSeq,
        s"BMP ${w}x$h seed=$seed")
      assert(PngCodec.decode(PngCodec.encode(img)).rgb.toSeq === rgb.toSeq,
        s"PNG ${w}x$h seed=$seed")
    }
    for ((n0, rate, seed) <- samples(gen, 60, 19L)) {
      val n = n0 * 37 + 1
      val rnd = new scala.util.Random(seed)
      val s = Array.fill[Short](n)((rnd.nextInt(65536) - 32768).toShort)
      val back = WavCodec.decode(WavCodec.encode(WavCodec.Audio(rate * 997 + 1, s)))
      assert(back.sampleRate === rate * 997 + 1, s"WAV rate n=$n seed=$seed")
      assert(back.samples.toSeq === s.toSeq, s"WAV samples n=$n seed=$seed")
    }
    val aviGen = for {
      nf <- Gen.choose(1, 8)
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 48)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (nf, w, h, seed)
    for ((nf, w, h, seed) <- samples(aviGen, 60, 23L)) {
      val rnd = new scala.util.Random(seed)
      // frame byte lengths deliberately mix odd/even to exercise pad bytes
      val frames = IndexedSeq.fill(nf)(Array.fill[Byte](1 + rnd.nextInt(300))(
        rnd.nextInt(256).toByte))
      val a = AviCodec.Avi(w, h, 33366, frames)
      val back = AviCodec.decode(AviCodec.encode(a))
      assert((back.width, back.height, back.frames.length) === ((w, h, nf)),
        s"AVI shape seed=$seed")
      for (i <- 0 until nf)
        assert(back.frames(i).toSeq === frames(i).toSeq, s"AVI frame $i seed=$seed")
    }
  }

  test("JPEG fuzz: random rasters survive the lossy chain inside the spec-pinned error bound") {
    import graft.ops.{BmpCodec, JpegCodec}
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 32)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (w, h, seed)
    for ((w, h, seed) <- samples(gen, 40, 29L)) {
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val back = JpegCodec.decode(JpegCodec.encode(BmpCodec.Image(w, h, rgb)))
      assert((back.width, back.height) === ((w, h)), s"JPEG dims ${w}x$h seed=$seed")
      var maxErr = 0
      var k = 0
      while (k < rgb.length) {
        val e = math.abs((back.rgb(k) & 0xff) - (rgb(k) & 0xff))
        if (e > maxErr) maxErr = e
        k += 1
      }
      // random noise is JPEG's worst case; the per-pixel bound is looser
      // than the structured-raster 64 the targeted spec pins, but still a
      // hard invariant of the quantizer tables in use
      assert(maxErr <= 128, s"JPEG ${w}x$h seed=$seed: max per-pixel error $maxErr")
    }
  }

  test("FLAC fuzz: encode∘decode identity over random rates, lengths, and sample distributions") {
    import graft.ops.FlacCodec
    val gen = for {
      n <- Gen.choose(1, 12000)
      rate <- Gen.choose(1, 192000)
      mode <- Gen.oneOf("random", "constant", "ramp", "extreme", "law")
      seed <- Gen.choose(0L, 1L << 40)
    } yield (n, rate, mode, seed)
    for ((n, rate, mode, seed) <- samples(gen, 60, 13L)) {
      val rnd = new scala.util.Random(seed)
      val s: Array[Short] = mode match {
        case "random"   => Array.fill[Short](n)((rnd.nextInt(65536) - 32768).toShort)
        case "constant" => Array.fill[Short](n)((seed % 65536 - 32768).toShort)
        case "ramp"     => Array.tabulate[Short](n)(i => ((i * 3 + seed) % 65536 - 32768).toShort)
        case "extreme"  => Array.tabulate[Short](n) {
          case i if i % 2 == 0 => Short.MinValue
          case _               => Short.MaxValue
        }
        case _          => FlacCodec.synthSamples(seed, n)
      }
      val a = FlacCodec.Audio(rate, s)
      val round = FlacCodec.decode(FlacCodec.encode(a))
      assert(round.sampleRate === rate, s"rate n=$n mode=$mode seed=$seed")
      assert(round.samples.toSeq === s.toSeq, s"samples n=$n rate=$rate mode=$mode seed=$seed")
    }
  }
}
