package graft

import graft.ops.WebpCodec

class WebpCodecSpec extends SparkSpecBase {

  test("encode∘decode is the identity across dims, channel shapes, and code forms") {
    // the synth law (≤64 distinct per channel → full-form codes + a
    // zero-bit alpha code) across dim shapes including 1×1
    for ((w, h) <- Seq((1, 1), (7, 3), (25, 17), (64, 64), (33, 1))) {
      for (seed <- Seq(0L, 5L, 777L)) {
        val img = WebpCodec.synthArgb(seed, w, h)
        val round = WebpCodec.decode(WebpCodec.encode(img))
        assert((round.width, round.height) === ((w, h)), s"dims at $w x $h seed $seed")
        assert(round.argb.toSeq === img.argb.toSeq, s"pixels at $w x $h seed $seed")
      }
    }
    // full-entropy channels (all 256 values + real alpha): the worst case
    // for the length-limited Huffman build
    val rnd = new scala.util.Random(11)
    val noisy = WebpCodec.Argb(61, 47, Array.fill(61 * 47)(rnd.nextInt()))
    assert(WebpCodec.decode(WebpCodec.encode(noisy)).argb.toSeq === noisy.argb.toSeq)
    // constant image: every channel is a simple one-symbol (zero-bit) code
    val const = WebpCodec.Argb(40, 30, Array.fill(1200)(0xff102030))
    val cEnc = WebpCodec.encode(const)
    assert(WebpCodec.decode(cEnc).argb.forall(_ == 0xff102030))
    assert(cEnc.length < 100, s"a constant raster must code in O(header) bytes, got ${cEnc.length}")
    // two-value channels: the simple TWO-symbol form both ways
    val duo = WebpCodec.Argb(16, 16,
      Array.tabulate(256)(p => if (p % 3 == 0) 0xff204080 else 0xff80ff01))
    assert(WebpCodec.decode(WebpCodec.encode(duo)).argb.toSeq === duo.argb.toSeq)
  }

  test("the literal entropy coder genuinely compresses the pixel law") {
    val enc = WebpCodec.synth(seed = 9, width = 40, height = 30)
    // ≤64 distinct values per channel + constant alpha ⇒ well under
    // 3 bytes/pixel; raw ARGB would be 4
    assert(enc.length < 3 * 40 * 30,
      s"entropy coding must beat 3 B/px on the 64-level law, got ${enc.length} for 1200 px")
  }

  test("structural validation trips loudly; out-of-profile features are named") {
    val enc = WebpCodec.synth(seed = 3, width = 10, height = 8)
    assert(WebpCodec.isWebp(enc))
    assert(!WebpCodec.isWebp("RIFFxxxxWEBPVP8 ".getBytes))
    intercept[IllegalArgumentException](WebpCodec.decode(
      java.util.Arrays.copyOf(enc, enc.length - 4)))
    intercept[IllegalArgumentException](WebpCodec.decode(new Array[Byte](30)))
    // flip the first post-version bit (the transform flag) — the stream
    // then claims a transform, which the profile rejects BY NAME
    // layout: bytes 20 is the 0x2f signature; the bitstream starts at 21;
    // 14+14+1+3 = 32 header bits land exactly in bytes 21..24, so the
    // transform bit is bit 0 of byte 25
    val t = enc.clone()
    t(25) = (t(25) | 0x01).toByte
    val e1 = intercept[IllegalArgumentException](WebpCodec.decode(t))
    assert(e1.getMessage.contains("transforms"))
    // same for the color-cache bit (bit 1 of byte 25)
    val c = enc.clone()
    c(25) = (c(25) | 0x02).toByte
    val e2 = intercept[IllegalArgumentException](WebpCodec.decode(c))
    assert(e2.getMessage.contains("color cache"))
    // encoder input validation
    intercept[IllegalArgumentException](WebpCodec.encode(
      WebpCodec.Argb(2, 2, new Array[Int](3))))
    intercept[IllegalArgumentException](WebpCodec.encode(
      WebpCodec.Argb(0, 2, new Array[Int](0))))
  }

  test("huffLengths: Kraft-valid, length-limited, canonical codes prefix-free") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      // odd trials model the 19-symbol CLC (maxLen 7 — an alphabet any
      // bigger than 2^7 could not be coded in 7 bits at all)
      val maxLen = if (trial % 2 == 0) 15 else 7
      val n = 2 + rnd.nextInt(if (maxLen == 7) 17 else 279)
      val freq = Array.fill(n)(if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(1000).toLong + 1)
      if (freq.count(_ > 0) < 2) freq(0) = 1 // degenerate guard for the property
      val lens = WebpCodec.huffLengths(freq, maxLen)
      assert(lens.max <= maxLen, s"trial $trial exceeded maxLen")
      freq.indices.foreach { s =>
        assert((freq(s) > 0) === (lens(s) > 0), s"trial $trial symbol $s coded iff used")
      }
      if (freq.count(_ > 0) >= 2) {
        // COMPLETE, not just feasible: strict decoders (libwebp) reject
        // under-subscribed codes, so the Kraft sum must be exactly 1
        val kraft = lens.filter(_ > 0).map(l => math.pow(2, -l)).sum
        assert(math.abs(kraft - 1.0) < 1e-9, s"trial $trial Kraft $kraft != 1")
        // canonical codes must be prefix-free: sort by (len, code)
        val codes = WebpCodec.canonicalCodes(lens)
        val coded = lens.indices.filter(lens(_) > 0)
          .map(s => (lens(s), codes(s))).sorted
        coded.sliding(2).foreach {
          case Seq((l1, c1), (l2, c2)) =>
            assert(!(c2 >> (l2 - l1) == c1), s"trial $trial: ($l1,$c1) prefixes ($l2,$c2)")
          case _ => ()
        }
      }
    }
    // adversarial: geometric frequencies force a depth-24 tree → the
    // repair path, which must still land on a COMPLETE code
    val skew = Array.tabulate(25)(i => 1L << (24 - i))
    val lens = WebpCodec.huffLengths(skew, 15)
    assert(lens.max <= 15)
    val kraft = lens.filter(_ > 0).map(l => math.pow(2, -l)).sum
    assert(math.abs(kraft - 1.0) < 1e-9, s"repaired code incomplete: Kraft $kraft")
    // and an image whose channel histogram triggers the repair must still
    // round-trip through the public encode/decode pair
    val rnd2 = new scala.util.Random(23)
    val px = Array.tabulate(60 * 60) { p =>
      // green channel ~geometric: value v with frequency ~2^-v
      var v = 0
      while (v < 24 && rnd2.nextBoolean()) v += 1
      0xff000000 | ((p % 256) << 16) | (v << 8) | ((p * 7) % 256)
    }
    val img = WebpCodec.Argb(60, 60, px)
    assert(WebpCodec.decode(WebpCodec.encode(img)).argb.toSeq === px.toSeq)
  }
}
