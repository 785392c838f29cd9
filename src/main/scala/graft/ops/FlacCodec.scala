package graft.ops

/** Pure-JVM FLAC codec — the fourth REAL codec of the multimodal tier
  * (after BMP/PNG/JPEG/WAV/AVI), closing the audio tier's fake-arm seam:
  * lossless compressed audio runs an actual encoder/decoder end-to-end,
  * same oracle-validates-the-codec device as [[WavCodec]] (synthesize
  * samples by a closed-form integer law → encode → decode → exact-integer
  * features; the DuckDB oracle replays the law, so any bit the codec path
  * flips breaks the hash gate).
  *
  * Profile (a strict subset of the FLAC spec, all of it real):
  *  - 16-bit mono, fixed blocksize 4096 (a streamable subset encode);
  *  - FIXED predictors, orders 0..4 (the integer-polynomial family —
  *    o(n) = Σ (-1)^k C(o,k) s(n-k-1); chosen per subframe by minimal
  *    total residual magnitude, the standard encoder heuristic), plus
  *    CONSTANT and VERBATIM subframes where they win;
  *  - partitioned-Rice residual coding, method 0, partition order 0; the
  *    4-bit escape (0b1111 → 5-bit raw width) is DECODE-side only — the
  *    encoder's lossless ceiling is the VERBATIM subframe (its cost bounds
  *    the subframe search), while the escape lets the decoder accept
  *    conformant streams this encoder would not emit;
  *  - real integrity chain: CRC-8 (poly 0x07) over each frame header,
  *    CRC-16 (poly 0x8005) over each whole frame, and the STREAMINFO MD5
  *    of the raw little-endian samples — all three VERIFIED on decode,
  *    so a corrupt stream fails loudly, never silently.
  *
  * The decoder accepts the general bitstream grammar of this profile (it
  * reads blocksize/rate/order from the STREAM, walks unknown metadata
  * blocks, handles the UTF-8-coded frame number), not just this encoder's
  * output — MultimodalSpec feeds it hand-corrupted streams.
  *
  * The reference has no audio at all (Django film catalog,
  * /root/reference/movies_admin/movies/models.py) — this tier is the
  * training-data-pipeline extension the build mandates.
  */
object FlacCodec {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private val BlockSize = 4096
  private val MaxFixedOrder = 4

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 42 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

  // ---------------------------------------------------------------- CRCs
  // FLAC frame-header CRC-8: x^8 + x^2 + x + 1 (poly 0x07), init 0
  private[ops] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  // FLAC frame CRC-16: x^16 + x^15 + x^2 + 1 (poly 0x8005), init 0
  private[ops] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bit I/O
  /** MSB-first bit writer (FLAC's bit order). */
  private final class BitWriter {
    private var buf = new Array[Byte](1 << 12)
    private var bytePos = 0
    private var bitPos = 0 // bits used in the current byte

    private def ensure(): Unit =
      if (bytePos >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)

    def writeBit(b: Int): Unit = {
      ensure()
      if ((b & 1) != 0) buf(bytePos) = (buf(bytePos) | (0x80 >> bitPos)).toByte
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }

    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }

    def alignByte(): Unit = while (bitPos != 0) writeBit(0)

    def length: Int = bytePos + (if (bitPos > 0) 1 else 0)
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, length)
  }

  /** MSB-first bit reader with a hard end: overruns throw (truncation is an
    * error, like every malformed-stream case in this tier's codecs).
    */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var bytePos: Int = startByte
    private var bitPos = 0

    def bit(): Int = {
      require(bytePos < bytes.length, "truncated FLAC bitstream")
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }

    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q <= (1 << 24), "unary run overruns any sane residual")
      }
      q
    }

    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atByteBoundary: Boolean = bitPos == 0
  }

  // -------------------------------------------------------- fixed predictors
  /** Residual of fixed order `o` at position n (n >= o), from raw samples:
    * the o-th order finite difference — FLAC's fixed-predictor family.
    */
  private def residuals(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n - order)
    var i = order
    while (i < n) {
      val r = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      out(i - order) = r
      i += 1
    }
    out
  }

  /** Invert the fixed predictor in place: `s` holds `order` warm-up samples
    * followed by residuals; after the call it holds raw samples.
    */
  private def restore(s: Array[Int], order: Int): Unit = {
    var i = order
    while (i < s.length) {
      order match {
        case 0 => ()
        case 1 => s(i) += s(i - 1)
        case 2 => s(i) += 2 * s(i - 1) - s(i - 2)
        case 3 => s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      i += 1
    }
  }

  // ------------------------------------------------------------ rice coding
  private def zigzagEnc(v: Int): Long = if (v >= 0) v.toLong << 1 else ((-v.toLong) << 1) - 1
  private def zigzagDec(u: Long): Int = {
    val v = (u >>> 1).toInt
    if ((u & 1L) == 0L) v else -v - 1
  }

  /** Best 4-bit Rice parameter (0..14) for the residual block, by exact
    * coded-size count; returns (param, bits). 15 is the ESCAPE code.
    */
  private def bestRice(res: Array[Int]): (Int, Long) = {
    var bestP = 0
    var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var bits = 0L
      var i = 0
      while (i < res.length && bits < bestBits) {
        bits += (zigzagEnc(res(i)) >>> p) + 1 + p
        i += 1
      }
      if (bits < bestBits) { bestBits = bits; bestP = p }
      p += 1
    }
    (bestP, bestBits)
  }

  // ------------------------------------------------------------- encode
  /** Encode 16-bit mono PCM as a subset FLAC stream. Lossless: decode ∘
    * encode is the identity on (rate, samples) — MultimodalSpec pins it.
    */
  def encode(a: Audio): Array[Byte] = {
    require(a.sampleRate > 0 && a.sampleRate < (1 << 20), s"implausible rate ${a.sampleRate}")
    require(a.samples.length > 0, "cannot encode an empty sample stream")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')

    // STREAMINFO (last-metadata-block flag set, type 0, length 34)
    val si = new BitWriter
    si.writeBits(1L, 1); si.writeBits(0L, 7); si.writeBits(34L, 24)
    si.writeBits(BlockSize.toLong, 16) // min blocksize
    si.writeBits(BlockSize.toLong, 16) // max blocksize
    si.writeBits(0L, 24); si.writeBits(0L, 24) // min/max framesize unknown
    si.writeBits(a.sampleRate.toLong, 20)
    si.writeBits(0L, 3)  // channels - 1 (mono)
    si.writeBits(15L, 5) // bits per sample - 1
    si.writeBits(a.samples.length.toLong, 36)
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Byte](a.samples.length * 2)
    var i = 0
    while (i < a.samples.length) { // FLAC hashes the UNENCODED little-endian stream
      raw(2 * i) = (a.samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((a.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val digest = md.digest(raw)
    val siBytes = si.toBytes
    out.write(siBytes, 0, siBytes.length)
    out.write(digest, 0, 16)

    // frames
    var frameIdx = 0L
    var off = 0
    while (off < a.samples.length) {
      val n = math.min(BlockSize, a.samples.length - off)
      val block = new Array[Int](n)
      var j = 0
      while (j < n) { block(j) = a.samples(off + j).toInt; j += 1 }
      val fb = encodeFrame(block, frameIdx, a.sampleRate)
      out.write(fb, 0, fb.length)
      frameIdx += 1
      off += n
    }
    out.toByteArray
  }

  private def encodeFrame(block: Array[Int], frameIdx: Long, rate: Int): Array[Byte] = {
    val w = new BitWriter
    // ---- header
    w.writeBits(0x3ffeL, 14)     // sync
    w.writeBits(0L, 1)           // reserved
    w.writeBits(0L, 1)           // fixed blocksize stream
    val bsCode =
      if (block.length == BlockSize) 12L // 4096 = code 12
      else 7L                            // get 16 bit (blocksize-1) from end of header
    w.writeBits(bsCode, 4)
    w.writeBits(0L, 4)           // sample rate: in STREAMINFO
    w.writeBits(0L, 4)           // channels: mono
    w.writeBits(4L, 3)           // sample size: 16 bits (code 100)
    w.writeBits(0L, 1)           // reserved
    writeUtf8Number(w, frameIdx)
    if (bsCode == 7L) w.writeBits((block.length - 1).toLong, 16)
    w.alignByte()
    val headerBytes = w.toBytes
    val h8 = crc8(headerBytes, 0, headerBytes.length)

    val w2 = new BitWriter
    // rebuild with CRC-8 appended (header is byte-aligned here)
    headerBytes.foreach(b => w2.writeBits((b & 0xff).toLong, 8))
    w2.writeBits(h8.toLong, 8)

    // ---- subframe
    writeSubframe(w2, block)
    w2.alignByte()
    val body = w2.toBytes
    val c16 = crc16(body, 0, body.length)
    val w3 = new BitWriter
    body.foreach(b => w3.writeBits((b & 0xff).toLong, 8))
    w3.writeBits(c16.toLong, 16)
    w3.toBytes
  }

  private def writeSubframe(w: BitWriter, block: Array[Int]): Unit = {
    val n = block.length
    // constant?
    var allSame = true
    var i = 1
    while (i < n && allSame) { if (block(i) != block(0)) allSame = false; i += 1 }
    if (allSame) {
      w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1) // CONSTANT
      w.writeBits((block(0).toLong & 0xffffL), 16)
      return
    }
    // pick the fixed order with minimal coded size (the classic heuristic,
    // by exact Rice cost here); verbatim is the fallback ceiling
    var bestOrder = -1
    var bestParam = 0
    var bestBits = 16L * n // verbatim cost
    var o = 0
    while (o <= math.min(MaxFixedOrder, n - 1)) {
      val res = residuals(block, o)
      val (p, rb) = bestRice(res)
      val total = 16L * o + rb + 2 + 4 + 4 // warmup + residuals + method/porder/param
      if (total < bestBits) { bestBits = total; bestOrder = o; bestParam = p }
      o += 1
    }
    if (bestOrder < 0) {
      w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1) // VERBATIM
      var j = 0
      while (j < n) { w.writeBits(block(j).toLong & 0xffffL, 16); j += 1 }
      return
    }
    // FIXED subframe: type 001xxx
    w.writeBits(0L, 1)
    w.writeBits(8L | bestOrder.toLong, 6)
    w.writeBits(0L, 1) // no wasted bits
    var j = 0
    while (j < bestOrder) { w.writeBits(block(j).toLong & 0xffffL, 16); j += 1 }
    val res = residuals(block, bestOrder)
    // partitioned Rice, method 0, partition order 0, one partition
    w.writeBits(0L, 2) // method 00
    w.writeBits(0L, 4) // partition order 0
    w.writeBits(bestParam.toLong, 4)
    var k = 0
    while (k < res.length) {
      val u = zigzagEnc(res(k))
      w.writeUnary((u >>> bestParam).toInt)
      w.writeBits(u & ((1L << bestParam) - 1), bestParam)
      k += 1
    }
  }

  /** FLAC's UTF-8-style frame-number coding (extended to 36 bits): a
    * k-byte sequence carries 7−k payload bits in the lead byte plus
    * 6(k−1) in continuations = 5k+1 bits total.
    */
  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80L) { w.writeBits(v, 8); return }
    var k = 2
    while (k < 7 && v >= (1L << (5 * k + 1))) k += 1
    var i = 0
    while (i < k) { w.writeBit(1); i += 1 } // k ones
    w.writeBit(0)
    w.writeBits(v >>> (6 * (k - 1)), 7 - k) // high payload bits
    var b = k - 2
    while (b >= 0) {
      w.writeBits(0x2L, 2) // 10
      w.writeBits((v >>> (6 * b)) & 0x3fL, 6)
      b -= 1
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val first = r.bits(8)
    if ((first & 0x80L) == 0L) return first
    var ones = 0
    var mask = 0x80L
    while ((first & mask) != 0L && ones < 8) { ones += 1; mask >>= 1 }
    require(ones >= 2 && ones <= 7, s"invalid UTF-8 frame-number lead byte $first")
    var v = first & ((1L << (8 - ones - 1)) - 1)
    var i = 1
    while (i < ones) {
      val c = r.bits(8)
      require((c & 0xc0L) == 0x80L, "invalid UTF-8 continuation in frame number")
      v = (v << 6) | (c & 0x3fL)
      i += 1
    }
    v
  }

  // ------------------------------------------------------------- decode
  /** Decode a subset-profile FLAC stream (16-bit mono, fixed predictors).
    * Verifies CRC-8, CRC-16, and the STREAMINFO MD5 — corruption throws.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(isFlac(bytes), "not a FLAC payload (missing fLaC magic)")
    var pos = 4
    // metadata blocks
    var last = false
    var rate = -1
    var totalSamples = -1L
    var expectMd5: Array[Byte] = null
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      last = (bytes(pos) & 0x80) != 0
      val btype = bytes(pos) & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      require(pos + 4 + len <= bytes.length, s"truncated metadata block type $btype")
      if (btype == 0) {
        require(len == 34, s"STREAMINFO must be 34 bytes ($len)")
        val r = new BitReader(bytes, pos + 4)
        r.bits(16); r.bits(16) // min/max blocksize
        r.bits(24); r.bits(24) // min/max framesize
        rate = r.bits(20).toInt
        val channels = r.bits(3).toInt + 1
        val bps = r.bits(5).toInt + 1
        totalSamples = r.bits(36)
        require(channels == 1, s"unsupported channel count $channels (mono only)")
        require(bps == 16, s"unsupported bit depth $bps (16-bit only)")
        require(rate > 0, "invalid sample rate")
        expectMd5 = java.util.Arrays.copyOfRange(bytes, pos + 4 + 18, pos + 4 + 34)
      }
      pos += 4 + len
    }
    require(rate > 0 && totalSamples >= 0, "no STREAMINFO block")
    // strict < Int.MaxValue: .toInt of 2^31 would wrap negative and throw
    // NegativeArraySizeException instead of this named require (r13 ADVICE)
    require(totalSamples < Int.MaxValue, "implausible sample count")

    val outSamples = new Array[Short](totalSamples.toInt)
    var written = 0
    var expectFrame = 0L
    while (written < totalSamples) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      require(r.bits(14) == 0x3ffeL, s"bad frame sync at byte $frameStart")
      r.bits(1) // reserved
      r.bits(1) // blocking strategy
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chCode = r.bits(4).toInt
      val ssCode = r.bits(3).toInt
      r.bits(1)
      require(chCode == 0, s"unsupported channel layout code $chCode")
      require(ssCode == 4, s"unsupported sample-size code $ssCode (16-bit only)")
      val frameNo = readUtf8Number(r)
      require(frameNo == expectFrame, s"frame number $frameNo, expected $expectFrame")
      val blockLen = bsCode match {
        case 1          => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6          => r.bits(8).toInt + 1
        case 7          => r.bits(16).toInt + 1
        case c if c >= 8 && c <= 15 => 256 << (c - 8)
        case other => throw new IllegalArgumentException(s"reserved blocksize code $other")
      }
      srCode match {
        case 0 => () // from STREAMINFO
        case 12 => r.bits(8)
        case 13 | 14 => r.bits(16)
        case c if c >= 1 && c <= 11 => ()
        case other => throw new IllegalArgumentException(s"invalid sample-rate code $other")
      }
      r.alignByte()
      val headerEnd = r.bytePos
      val declared8 = r.bits(8).toInt
      require(crc8(bytes, frameStart, headerEnd) == declared8,
        s"frame header CRC-8 mismatch at byte $frameStart")
      require(blockLen > 0 && written + blockLen <= totalSamples,
        s"frame overruns declared total samples")

      // subframe
      require(r.bits(1) == 0L, "subframe padding bit must be 0")
      val sfType = r.bits(6).toInt
      val wasted = r.bits(1)
      require(wasted == 0L, "wasted-bits subframes unsupported in this profile")
      val block = new Array[Int](blockLen)
      sfType match {
        case 0 => // CONSTANT
          val v = signed16(r.bits(16))
          java.util.Arrays.fill(block, v)
        case 1 => // VERBATIM
          var j = 0
          while (j < blockLen) { block(j) = signed16(r.bits(16)); j += 1 }
        case t if (t & 0x38) == 0x08 => // FIXED, order in low 3 bits
          val order = t & 0x07
          require(order <= MaxFixedOrder, s"fixed order $order out of range")
          require(order <= blockLen, "order exceeds block length")
          var j = 0
          while (j < order) { block(j) = signed16(r.bits(16)); j += 1 }
          readRiceResiduals(r, block, order, blockLen)
          restore(block, order)
        case other =>
          throw new IllegalArgumentException(
            f"unsupported subframe type 0x$other%02x (LPC not in this profile)")
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      val declared16 = r.bits(16).toInt
      require(crc16(bytes, frameStart, bodyEnd) == declared16,
        s"frame CRC-16 mismatch at byte $frameStart")
      var j = 0
      while (j < blockLen) {
        require(block(j) >= Short.MinValue && block(j) <= Short.MaxValue,
          "decoded sample exceeds 16-bit range (corrupt residuals)")
        outSamples(written + j) = block(j).toShort
        j += 1
      }
      written += blockLen
      expectFrame += 1
      pos = r.bytePos
    }

    // STREAMINFO MD5 over the raw little-endian sample stream
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Byte](outSamples.length * 2)
    var i = 0
    while (i < outSamples.length) {
      raw(2 * i) = (outSamples(i) & 0xff).toByte
      raw(2 * i + 1) = ((outSamples(i) >> 8) & 0xff).toByte
      i += 1
    }
    require(java.util.Arrays.equals(md.digest(raw), expectMd5),
      "STREAMINFO MD5 mismatch (stream decodes but is not the signed audio)")
    Audio(rate, outSamples)
  }

  private def signed16(v: Long): Int = {
    val x = (v & 0xffffL).toInt
    if (x >= 0x8000) x - 0x10000 else x
  }

  private def readRiceResiduals(r: BitReader, block: Array[Int],
                                order: Int, blockLen: Int): Unit = {
    val method = r.bits(2).toInt
    require(method == 0, s"rice method $method unsupported (4-bit params only)")
    val porder = r.bits(4).toInt
    require(porder == 0, s"partition order $porder unsupported in this profile")
    val param = r.bits(4).toInt
    var j = order
    if (param == 15) { // escape: raw residuals at explicit width
      val width = r.bits(5).toInt
      while (j < blockLen) {
        val u = r.bits(width)
        val shift = 64 - width
        block(j) = ((u << shift) >> shift).toInt // sign-extend
        j += 1
      }
    } else {
      while (j < blockLen) {
        val q = r.unary()
        val u = (q.toLong << param) | r.bits(param)
        block(j) = zigzagDec(u)
        j += 1
      }
    }
  }

  /** Deterministic synthetic audio for the oracle law — the same integer
    * sample family as [[WavCodec.synthSamples]] with a distinct mixing
    * constant, so the FLAC features replay in SQL without either codec.
    */
  def synthSamples(seed: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => ((seed * 241 + i.toLong * 661) % 4001 - 2000).toShort)

  def synth(seed: Long, n: Int, rate: Int): Array[Byte] =
    encode(Audio(rate, synthSamples(seed, n)))
}
