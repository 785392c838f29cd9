package graft.ops

/** Pure-JVM baseline JPEG codec — the TRANSFORM-CODED image format that was
  * the multimodal tier's last declared stub seam: real 8×8 integer DCT
  * (Loeffler/Ligtenberg/Moshovitz butterflies in 13-bit fixed point — the
  * textbook integer-DCT construction), frequency-dependent quantization,
  * canonical-Huffman entropy coding with DC prediction and AC run-length
  * (ZRL/EOB), JFIF marker segments, and 0xFF byte stuffing. 4:4:4 (no
  * chroma subsampling), single interleaved scan, no restart markers.
  *
  * The quantization and Huffman tables are generated ALGORITHMICALLY
  * (`qLuma/qChroma`, single-length canonical codes) rather than copied
  * from the spec's example Annex — JPEG embeds whatever tables a stream
  * uses in its own DQT/DHT segments, so the stream stays self-describing
  * and conformant while both engines can replay the table LAW.
  *
  * Determinism contract (what the oracle leans on): for a block of
  * CONSTANT color every AC coefficient is EXACTLY zero (butterfly ACs are
  * differences of equal values — true regardless of constant rounding),
  * the DC path is the closed form
  * `dq = sround(64·(ch−128), 8·q)` → `rec = clamp(128 + (dq·q + 4) >> 3)`,
  * and the decoder takes an explicit DC-only shortcut that computes
  * exactly that. General blocks run the full butterflies (lossy, bounded
  * error — spec-pinned, not oracle-pinned).
  */
object JpegCodec {

  // ---- fixed-point DCT constants (13-bit), Loeffler et al. 1989 ----
  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val FIX_0_298631336 = 2446
  private final val FIX_0_390180644 = 3196
  private final val FIX_0_541196100 = 4433
  private final val FIX_0_765366865 = 6270
  private final val FIX_0_899976223 = 7373
  private final val FIX_1_175875602 = 9633
  private final val FIX_1_501321110 = 12299
  private final val FIX_1_847759065 = 15137
  private final val FIX_1_961570560 = 16069
  private final val FIX_2_053119869 = 16819
  private final val FIX_2_562915447 = 20995
  private final val FIX_3_072711026 = 25172

  @inline private def descale(x: Long, n: Int): Int =
    ((x + (1L << (n - 1))) >> n).toInt

  /** Symmetric round-half-away integer division — the quantizer. */
  @inline private[graft] def sround(a: Int, b: Int): Int =
    if (a >= 0) (a + b / 2) / b else -((-a + b / 2) / b)

  // ---- table laws (replayable: both engines can recompute them) ----
  private[graft] def qLuma(u: Int, v: Int): Int = 6 + 2 * (u + v)
  private[graft] def qChroma(u: Int, v: Int): Int = 8 + 3 * (u + v)

  /** Zigzag scan order, generated (zz(i) = raster index of the i-th
    * zigzag position) — no hand-typed table to get wrong.
    */
  private[graft] val zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (d <- 0 until 15) {
      // even anti-diagonals run upward (row d..0 = col ascending), odd
      // ones downward — the standard order: (0,0) (0,1) (1,0) (2,0) …
      val xs = if (d % 2 == 0) (math.max(0, d - 7) to math.min(d, 7))
               else (math.min(d, 7) to math.max(0, d - 7) by -1)
      for (x <- xs) { val y = d - x; out(i) = y * 8 + x; i += 1 }
    }
    out
  }

  private def quantTable(chroma: Boolean): Array[Int] =
    Array.tabulate(64) { k => // in zigzag order, as DQT stores it
      val pos = zigzag(k); val u = pos % 8; val v = pos / 8
      if (chroma) qChroma(u, v) else qLuma(u, v)
    }

  // ---- canonical Huffman: DC symbols 0..13 at length 4, AC symbols
  // (EOB, ZRL, run 0..15 × size 1..14) at length 9 — valid canonical
  // specs (neither exhausts its length's code space, so the all-ones
  // code of the final length never occurs, as the spec requires) ----
  private val dcSyms: Array[Int] = (0 to 13).toArray
  private val acSyms: Array[Int] = {
    val b = Array.newBuilder[Int]
    b += 0x00 // EOB
    b += 0xF0 // ZRL
    for (run <- 0 to 15; size <- 1 to 14) b += ((run << 4) | size)
    b.result()
  }
  private val dcLen = 4
  private val acLen = 9
  private val dcCode: Map[Int, Int] = dcSyms.zipWithIndex.toMap
  private val acCode: Map[Int, Int] = acSyms.zipWithIndex.toMap

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  // ---------------------------------------------------------------- FDCT
  /** In-place 2-D FDCT over a level-shifted block (row-major 64 ints);
    * output is the coefficient ×8 scale the quantizer expects.
    */
  private def fdct(b: Array[Int]): Unit = {
    // rows
    var off = 0
    while (off < 64) {
      val tmp0 = b(off) + b(off + 7); val tmp7 = b(off) - b(off + 7)
      val tmp1 = b(off + 1) + b(off + 6); val tmp6 = b(off + 1) - b(off + 6)
      val tmp2 = b(off + 2) + b(off + 5); val tmp5 = b(off + 2) - b(off + 5)
      val tmp3 = b(off + 3) + b(off + 4); val tmp4 = b(off + 3) - b(off + 4)
      val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
      val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
      b(off) = (tmp10 + tmp11) << Pass1Bits
      b(off + 4) = (tmp10 - tmp11) << Pass1Bits
      val z1 = (tmp12 + tmp13).toLong * FIX_0_541196100
      b(off + 2) = descale(z1 + tmp13.toLong * FIX_0_765366865, ConstBits - Pass1Bits)
      b(off + 6) = descale(z1 - tmp12.toLong * FIX_1_847759065, ConstBits - Pass1Bits)
      var z1o = (tmp4 + tmp7).toLong; var z2 = (tmp5 + tmp6).toLong
      var z3 = (tmp4 + tmp6).toLong; var z4 = (tmp5 + tmp7).toLong
      val z5 = (z3 + z4) * FIX_1_175875602
      val t4 = tmp4.toLong * FIX_0_298631336
      val t5 = tmp5.toLong * FIX_2_053119869
      val t6 = tmp6.toLong * FIX_3_072711026
      val t7 = tmp7.toLong * FIX_1_501321110
      z1o *= -FIX_0_899976223; z2 *= -FIX_2_562915447
      z3 *= -FIX_1_961570560; z4 *= -FIX_0_390180644
      z3 += z5; z4 += z5
      b(off + 7) = descale(t4 + z1o + z3, ConstBits - Pass1Bits)
      b(off + 5) = descale(t5 + z2 + z4, ConstBits - Pass1Bits)
      b(off + 3) = descale(t6 + z2 + z3, ConstBits - Pass1Bits)
      b(off + 1) = descale(t7 + z1o + z4, ConstBits - Pass1Bits)
      off += 8
    }
    // columns
    var c = 0
    while (c < 8) {
      val tmp0 = b(c) + b(c + 56); val tmp7 = b(c) - b(c + 56)
      val tmp1 = b(c + 8) + b(c + 48); val tmp6 = b(c + 8) - b(c + 48)
      val tmp2 = b(c + 16) + b(c + 40); val tmp5 = b(c + 16) - b(c + 40)
      val tmp3 = b(c + 24) + b(c + 32); val tmp4 = b(c + 24) - b(c + 32)
      val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
      val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
      b(c) = descale((tmp10 + tmp11).toLong << ConstBits, ConstBits + Pass1Bits)
      b(c + 32) = descale((tmp10 - tmp11).toLong << ConstBits, ConstBits + Pass1Bits)
      val z1 = (tmp12 + tmp13).toLong * FIX_0_541196100
      b(c + 16) = descale(z1 + tmp13.toLong * FIX_0_765366865, ConstBits + Pass1Bits)
      b(c + 48) = descale(z1 - tmp12.toLong * FIX_1_847759065, ConstBits + Pass1Bits)
      var z1o = (tmp4 + tmp7).toLong; var z2 = (tmp5 + tmp6).toLong
      var z3 = (tmp4 + tmp6).toLong; var z4 = (tmp5 + tmp7).toLong
      val z5 = (z3 + z4) * FIX_1_175875602
      val t4 = tmp4.toLong * FIX_0_298631336
      val t5 = tmp5.toLong * FIX_2_053119869
      val t6 = tmp6.toLong * FIX_3_072711026
      val t7 = tmp7.toLong * FIX_1_501321110
      z1o *= -FIX_0_899976223; z2 *= -FIX_2_562915447
      z3 *= -FIX_1_961570560; z4 *= -FIX_0_390180644
      z3 += z5; z4 += z5
      b(c + 56) = descale(t4 + z1o + z3, ConstBits + Pass1Bits)
      b(c + 40) = descale(t5 + z2 + z4, ConstBits + Pass1Bits)
      b(c + 24) = descale(t6 + z2 + z3, ConstBits + Pass1Bits)
      b(c + 8) = descale(t7 + z1o + z4, ConstBits + Pass1Bits)
      c += 1
    }
  }

  // ---------------------------------------------------------------- IDCT
  /** 2-D IDCT over dequantized (true-scale) coefficients → unshifted
    * sample deltas; caller adds 128 and clamps. DC-only blocks take the
    * exact `(dc + 4) >> 3` shortcut the oracle replays.
    */
  private def idct(b: Array[Int]): Unit = {
    var allZero = true
    var i = 1
    while (i < 64 && allZero) { if (b(i) != 0) allZero = false; i += 1 }
    if (allZero) {
      val v = (b(0) + 4) >> 3
      java.util.Arrays.fill(b, v)
      return
    }
    // columns first (coefficients arrive ×1 true scale; pass 1 scales up)
    var c = 0
    while (c < 8) {
      val z2 = b(c + 16).toLong; val z3 = b(c + 48).toLong
      var z1 = (z2 + z3) * FIX_0_541196100
      val tmp2 = z1 + z3 * -FIX_1_847759065
      val tmp3 = z1 + z2 * FIX_0_765366865
      val tz2 = b(c).toLong; val tz3 = b(c + 32).toLong
      val tmp0 = (tz2 + tz3) << ConstBits
      val tmp1 = (tz2 - tz3) << ConstBits
      val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
      val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
      var t0 = b(c + 56).toLong; var t1 = b(c + 40).toLong
      var t2 = b(c + 24).toLong; var t3 = b(c + 8).toLong
      var oz1 = t0 + t3; var oz2 = t1 + t2
      var oz3 = t0 + t2; var oz4 = t1 + t3
      val z5 = (oz3 + oz4) * FIX_1_175875602
      t0 *= FIX_0_298631336; t1 *= FIX_2_053119869
      t2 *= FIX_3_072711026; t3 *= FIX_1_501321110
      oz1 *= -FIX_0_899976223; oz2 *= -FIX_2_562915447
      oz3 *= -FIX_1_961570560; oz4 *= -FIX_0_390180644
      oz3 += z5; oz4 += z5
      t0 += oz1 + oz3; t1 += oz2 + oz4; t2 += oz2 + oz3; t3 += oz1 + oz4
      b(c) = descale(tmp10 + t3, ConstBits - Pass1Bits)
      b(c + 56) = descale(tmp10 - t3, ConstBits - Pass1Bits)
      b(c + 8) = descale(tmp11 + t2, ConstBits - Pass1Bits)
      b(c + 48) = descale(tmp11 - t2, ConstBits - Pass1Bits)
      b(c + 16) = descale(tmp12 + t1, ConstBits - Pass1Bits)
      b(c + 40) = descale(tmp12 - t1, ConstBits - Pass1Bits)
      b(c + 24) = descale(tmp13 + t0, ConstBits - Pass1Bits)
      b(c + 32) = descale(tmp13 - t0, ConstBits - Pass1Bits)
      c += 1
    }
    // rows
    var off = 0
    while (off < 64) {
      val z2 = b(off + 2).toLong; val z3 = b(off + 6).toLong
      val z1 = (z2 + z3) * FIX_0_541196100
      val tmp2 = z1 + z3 * -FIX_1_847759065
      val tmp3 = z1 + z2 * FIX_0_765366865
      val tz2 = b(off).toLong; val tz3 = b(off + 4).toLong
      val tmp0 = (tz2 + tz3) << ConstBits
      val tmp1 = (tz2 - tz3) << ConstBits
      val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
      val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
      var t0 = b(off + 7).toLong; var t1 = b(off + 5).toLong
      var t2 = b(off + 3).toLong; var t3 = b(off + 1).toLong
      var oz1 = t0 + t3; var oz2 = t1 + t2
      var oz3 = t0 + t2; var oz4 = t1 + t3
      val z5 = (oz3 + oz4) * FIX_1_175875602
      t0 *= FIX_0_298631336; t1 *= FIX_2_053119869
      t2 *= FIX_3_072711026; t3 *= FIX_1_501321110
      oz1 *= -FIX_0_899976223; oz2 *= -FIX_2_562915447
      oz3 *= -FIX_1_961570560; oz4 *= -FIX_0_390180644
      oz3 += z5; oz4 += z5
      t0 += oz1 + oz3; t1 += oz2 + oz4; t2 += oz2 + oz3; t3 += oz1 + oz4
      b(off) = descale(tmp10 + t3, ConstBits + Pass1Bits + 3)
      b(off + 7) = descale(tmp10 - t3, ConstBits + Pass1Bits + 3)
      b(off + 1) = descale(tmp11 + t2, ConstBits + Pass1Bits + 3)
      b(off + 6) = descale(tmp11 - t2, ConstBits + Pass1Bits + 3)
      b(off + 2) = descale(tmp12 + t1, ConstBits + Pass1Bits + 3)
      b(off + 5) = descale(tmp12 - t1, ConstBits + Pass1Bits + 3)
      b(off + 3) = descale(tmp13 + t0, ConstBits + Pass1Bits + 3)
      b(off + 4) = descale(tmp13 - t0, ConstBits + Pass1Bits + 3)
      off += 8
    }
  }

  // ---- color transforms (integer spec; numerators arranged to stay
  // non-negative so the >>16 is a plain non-negative division both in
  // the JVM and in the oracle's SQL replay) ----
  @inline private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private[graft] def rgbToY(r: Int, g: Int, b: Int): Int =
    (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
  private[graft] def rgbToCb(r: Int, g: Int, b: Int): Int =
    clamp8((32768 * b - 11059 * r - 21709 * g + 8421376) >> 16)
  private[graft] def rgbToCr(r: Int, g: Int, b: Int): Int =
    clamp8((32768 * r - 27439 * g - 5329 * b + 8421376) >> 16)
  @inline private def sround16(x: Long): Int =
    (if (x >= 0) (x + 32768) >> 16 else -((-x + 32768) >> 16)).toInt
  private[graft] def yccToR(y: Int, cr: Int): Int = clamp8(y + sround16(91881L * (cr - 128)))
  private[graft] def yccToG(y: Int, cb: Int, cr: Int): Int =
    clamp8(y - sround16(22554L * (cb - 128) + 46802L * (cr - 128)))
  private[graft] def yccToB(y: Int, cb: Int): Int = clamp8(y + sround16(116130L * (cb - 128)))

  // ---------------------------------------------------------- bit I/O
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val byte = ((acc >> (n - 8)) & 0xff).toInt
        out.write(byte)
        if (byte == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n) } // pad with 1s
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "entropy stream truncated")
        var byte = bytes(pos) & 0xff; pos += 1
        if (byte == 0xff) {
          require(pos < bytes.length, "truncated after 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"unexpected marker 0xFF$m%02X in entropy data")
          pos += 1
        }
        acc = byte.toLong; n = 8
      }
      n -= 1
      ((acc >> n) & 1).toInt
    }
    def bits(len: Int): Int = { var v = 0; var i = 0; while (i < len) { v = (v << 1) | bit(); i += 1 }; v }
  }

  /** JPEG magnitude decoding: `size`-bit field → signed value. */
  @inline private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
  @inline private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  // --------------------------------------------------------------- encode
  /** Encode a top-down RGB raster as baseline JFIF (4:4:4). Dimensions pad
    * to block multiples by edge replication; SOF records the true dims.
    */
  def encode(img: BmpCodec.Image): Array[Byte] = {
    val w = img.width; val h = img.height
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, (Array(0x00) ++ quantTable(chroma = false)).map(_.toByte)) // DQT id0
    seg(0xdb, (Array(0x01) ++ quantTable(chroma = true)).map(_.toByte)) // DQT id1
    seg(0xc0, Array[Int](8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)) // SOF0
    val dcBits = Array.tabulate(16)(i => if (i + 1 == dcLen) dcSyms.length else 0)
    val acBits = Array.tabulate(16)(i => if (i + 1 == acLen) acSyms.length else 0)
    seg(0xc4, (Array(0x00) ++ dcBits ++ dcSyms).map(_.toByte)) // DHT DC0
    seg(0xc4, (Array(0x10) ++ acBits ++ acSyms).map(_.toByte)) // DHT AC0
    seg(0xda, Array[Int](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0).map(_.toByte)) // SOS
    val bw = new BitWriter(out)
    val preds = Array(0, 0, 0)
    val block = new Array[Int](64)
    @inline def px(x: Int, y: Int, ch: Int): Int = {
      val xx = math.min(x, w - 1); val yy = math.min(y, h - 1)
      img.rgb((yy * w + xx) * 3 + ch) & 0xff
    }
    for (by <- 0 until hb; bx <- 0 until wb; comp <- 0 until 3) {
      var i = 0
      while (i < 64) {
        val x = bx * 8 + i % 8; val y = by * 8 + i / 8
        val r = px(x, y, 0); val g = px(x, y, 1); val b = px(x, y, 2)
        val s = comp match {
          case 0 => rgbToY(r, g, b)
          case 1 => rgbToCb(r, g, b)
          case _ => rgbToCr(r, g, b)
        }
        block(i) = s - 128
        i += 1
      }
      fdct(block)
      val chroma = comp > 0
      // DC
      val q0 = if (chroma) qChroma(0, 0) else qLuma(0, 0)
      val dq = sround(block(0), 8 * q0)
      val diff = dq - preds(comp); preds(comp) = dq
      val s0 = bitLen(math.abs(diff))
      bw.put(dcCode(s0), dcLen)
      if (s0 > 0) bw.put(if (diff < 0) diff - 1 else diff, s0)
      // AC in zigzag
      var run = 0
      var k = 1
      while (k < 64) {
        val pos = zigzag(k); val u = pos % 8; val v = pos / 8
        val q = if (chroma) qChroma(u, v) else qLuma(u, v)
        val a = sround(block(pos), 8 * q)
        if (a == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xF0), acLen); run -= 16 }
          val sz = bitLen(math.abs(a))
          require(sz <= 14, s"AC magnitude $a exceeds the table's size range")
          bw.put(acCode((run << 4) | sz), acLen)
          bw.put(if (a < 0) a - 1 else a, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode(0x00), acLen) // EOB
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // --------------------------------------------------------------- decode
  private final case class Huff(maxLen: Int, lookup: Map[(Int, Int), Int])

  private def buildHuff(bits: Array[Int], vals: Array[Int]): Huff = {
    var code = 0; var k = 0
    val m = Map.newBuilder[(Int, Int), Int]
    var maxLen = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += ((len, code) -> vals(k)); k += 1; code += 1; i += 1
      }
      if (bits(len - 1) > 0) maxLen = len
      code <<= 1
    }
    require(k == vals.length, "DHT count mismatch")
    Huff(maxLen, m.result())
  }

  /** Decode a baseline 4:4:4 JFIF produced by [[encode]] or any conformant
    * encoder within this profile (8-bit, 3 components, 1×1 sampling, one
    * scan, no restart intervals). Tables are read from the STREAM's
    * DQT/DHT segments — never assumed.
    */
  def decode(bytes: Array[Byte]): BmpCodec.Image = {
    require(isJpeg(bytes), "not a JPEG payload (missing SOI)")
    var pos = 2
    var w = 0; var h = 0
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4); val acTabs = new Array[Huff](4)
    var compQ: Array[Int] = null; var compDc: Array[Int] = null
    var compAc: Array[Int] = null; var sofIds: Array[Int] = null
    var scanStart = -1
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    while (scanStart < 0) {
      require(pos + 4 <= bytes.length, "truncated marker stream")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      // the spec allows 0xFF fill bytes before any marker — skip runs
      while (pos + 4 <= bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9, "EOI before any scan (no image data)")
      require(m < 0xd0 || m > 0xd7, "unexpected RST marker in the header section")
      // TEM (0x01) and a stray stuffed 0x00 are LENGTH-LESS: reading
      // u16(pos+2) as a segment length would misparse the stream
      require(m != 0x00 && m != 0x01,
        f"standalone marker 0xFF$m%02X carries no length segment")
      val len = u16(pos + 2)
      require(pos + 2 + len <= bytes.length, f"truncated segment 0xFF$m%02X")
      val body = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = body
          while (o < pos + 2 + len) {
            val pq = (bytes(o) & 0xff) >> 4; val tq = bytes(o) & 0x0f
            require(pq == 0, "16-bit quant tables unsupported")
            require(tq <= 3, s"quant table id $tq out of range")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(zigzag(i)) = bytes(o + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            o += 65
          }
        case 0xc0 =>
          require((bytes(body) & 0xff) == 8, "only 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          val nc = bytes(body + 5) & 0xff
          require(nc == 3, s"only 3-component images ($nc)")
          compQ = new Array[Int](3)
          sofIds = new Array[Int](3)
          for (ci <- 0 until 3) {
            val o = body + 6 + ci * 3
            sofIds(ci) = bytes(o) & 0xff
            require((bytes(o + 1) & 0xff) == 0x11, "only 1x1 sampling (4:4:4)")
            compQ(ci) = bytes(o + 2) & 0xff
            require(compQ(ci) <= 3, s"quant table id ${compQ(ci)} out of range")
          }
        case 0xc4 => // DHT (possibly several tables)
          var o = body
          while (o < pos + 2 + len) {
            val tc = (bytes(o) & 0xff) >> 4; val th = bytes(o) & 0x0f
            require(tc <= 1 && th <= 3, s"DHT class/id ($tc, $th) out of range")
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
            val huff = buildHuff(bits, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            o += 17 + n
          }
        case 0xda =>
          val ns = bytes(body) & 0xff
          require(ns == 3, "single interleaved 3-component scan only")
          require(sofIds != null, "SOS before SOF")
          compDc = new Array[Int](3); compAc = new Array[Int](3)
          for (ci <- 0 until 3) {
            val cs = bytes(body + 1 + ci * 2) & 0xff
            require(cs == sofIds(ci),
              s"scan component order ($cs) diverges from SOF (${sofIds(ci)})")
            val sel = bytes(body + 2 + ci * 2) & 0xff
            compDc(ci) = sel >> 4; compAc(ci) = sel & 0x0f
            require(compDc(ci) <= 3 && compAc(ci) <= 3,
              s"Huffman table selector out of range for component $ci")
          }
          scanStart = pos + 2 + len
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(f"unsupported SOF marker 0xFF$m%02X (baseline only)")
        case 0xdd => throw new IllegalArgumentException("restart intervals unsupported")
        case _ => () // APPn / COM: skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    require(w > 0 && h > 0 && w <= (1 << 15) && h <= (1 << 15),
      s"implausible dimensions ${w}x$h")
    // pixel-count cap in LONG: w*h*3 wraps Int inside the per-dimension
    // allowance (e.g. 27000x27000), which would turn the reject into a
    // NegativeArraySizeException — and bounds the plane allocations
    require(w.toLong * h <= (1L << 28),
      s"raster ${w}x$h exceeds the 268M-pixel decode cap (well under the Int wrap; bounds buffers to ~1 GiB)")
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    val br = new BitReader(bytes, scanStart)
    def readSym(huff: Huff): Int = {
      var code = 0; var len = 0
      while (len <= huff.maxLen) {
        code = (code << 1) | br.bit(); len += 1
        huff.lookup.get((len, code)) match {
          case Some(s) => return s
          case None    => ()
        }
      }
      throw new IllegalArgumentException("invalid Huffman code in scan")
    }
    val preds = Array(0, 0, 0)
    val planes = Array.fill(3)(new Array[Int](wb * 8 * hb * 8))
    val block = new Array[Int](64)
    for (by <- 0 until hb; bx <- 0 until wb; comp <- 0 until 3) {
      java.util.Arrays.fill(block, 0)
      val qt = quant(compQ(comp))
      require(qt != null, s"missing quant table for component $comp")
      val dcH = dcTabs(compDc(comp)); val acH = acTabs(compAc(comp))
      require(dcH != null && acH != null, s"missing Huffman tables for component $comp")
      val s0 = readSym(dcH)
      val diff = extend(br.bits(s0), s0)
      preds(comp) += diff
      block(0) = preds(comp) * qt(0)
      var k = 1
      var done = false
      while (k < 64 && !done) {
        val sym = readSym(acH)
        if (sym == 0x00) done = true // EOB
        else if (sym == 0xF0) {
          k += 16 // ZRL: 16 zeros, no coefficient
          // strict <: a ZRL landing exactly on 64 is non-conformant (T.81
          // F.1.2.2 — trailing zeros shall be coded as EOB, ZRL only
          // precedes a nonzero coefficient). Such a stream WOULD decode
          // aligned (a complete block carries no EOB), so this is a
          // deliberate conformance rejection with a named reason, not a
          // misalignment guard (r13 ADVICE; premise corrected r14 review)
          require(k < 64, "non-conformant ZRL at block end (EOB required)")
        } else {
          k += sym >> 4
          require(k < 64, "AC run overruns the block")
          val sz = sym & 0x0f
          block(zigzag(k)) = extend(br.bits(sz), sz) * qt(zigzag(k))
          k += 1
        }
      }
      idct(block)
      val plane = planes(comp)
      var i = 0
      while (i < 64) {
        val x = bx * 8 + i % 8; val y = by * 8 + i / 8
        plane(y * wb * 8 + x) = clamp8(block(i) + 128)
        i += 1
      }
    }
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * wb * 8 + x
        val yy = planes(0)(o); val cb = planes(1)(o); val cr = planes(2)(o)
        val d = (y * w + x) * 3
        rgb(d) = yccToR(yy, cr).toByte
        rgb(d + 1) = yccToG(yy, cb, cr).toByte
        rgb(d + 2) = yccToB(yy, cb).toByte
        x += 1
      }
      y += 1
    }
    BmpCodec.Image(w, h, rgb)
  }

  /** Deterministic synthetic JPEG with an ORACLE-REPLAYABLE law: every 8×8
    * block is a CONSTANT color — `rgb(block i) = ((seed·131 + i·c_k) mod
    * 256)` with c = (17, 29, 47) per channel — so the whole lossy chain
    * collapses to the closed DC form (`sround`/shift arithmetic the oracle
    * replays exactly), while the ENCODED STREAM still runs real FDCT
    * butterflies, real quantization, real Huffman DC prediction, and real
    * byte stuffing on the way through. Dimensions are block multiples so
    * no padding path participates.
    */
  def synthDc(seed: Long, wBlocks: Int, hBlocks: Int): Array[Byte] = {
    require(seed >= 0 && wBlocks > 0 && hBlocks > 0)
    val w = wBlocks * 8; val h = hBlocks * 8
    val rgb = new Array[Byte](w * h * 3)
    var by = 0
    while (by < hBlocks) {
      var bx = 0
      while (bx < wBlocks) {
        val i = by * wBlocks + bx
        val r = ((seed * 131 + i * 17) % 256).toInt
        val g = ((seed * 131 + i * 29) % 256).toInt
        val b = ((seed * 131 + i * 47) % 256).toInt
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val d = ((by * 8 + yy) * w + bx * 8 + xx) * 3
            rgb(d) = r.toByte; rgb(d + 1) = g.toByte; rgb(d + 2) = b.toByte
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    encode(BmpCodec.Image(w, h, rgb))
  }
}
