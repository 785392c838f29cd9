package graft.ops

/** Pure-JVM WebP-lossless (VP8L) codec — the seventh real codec of the
  * multimodal tier, written from the public VP8L bitstream specification
  * (Google, "WebP Lossless Bitstream Specification"). The reference repo
  * has no media handling; this tier is the training-pipeline north star
  * the brief names.
  *
  * Profile (a strict subset of VP8L, all of it real):
  *  - RIFF/WEBP container with a single VP8L chunk (odd-size pad byte);
  *  - the LSB-first bitstream: signature 0x2f, 14-bit dimensions,
  *    version 0;
  *  - entropy-coded ARGB literals through FOUR canonical prefix codes
  *    (green 280, red/blue/alpha 256) plus the 40-symbol distance code —
  *    written in the SIMPLE two/one-symbol form where a channel has ≤2
  *    distinct values and in the FULL form otherwise: 19-symbol
  *    code-length code in the spec's transmission order, 3-bit CLC
  *    lengths, zero-run symbols 17 (3-10) and 18 (11-138), repeat
  *    symbol 16 accepted on read, `use_max_symbol` accepted on read;
  *  - length-limited canonical Huffman construction (≤15 main, ≤7 CLC)
  *    with Kraft repair, codes emitted MSB-first into the LSB-first
  *    stream exactly as libwebp's bit-reversal lands them on the wire.
  *
  * NOT in the profile — rejected loudly on decode, never emitted: the
  * four pixel transforms, the color cache, meta prefix images (entropy
  * tiling), and LZ77 backward references (green symbols ≥ 256). This is
  * the same honest-subset discipline as [[FlacCodec]] (no LPC) — every
  * stream the encoder emits is spec-legal and every accepted stream
  * decodes exactly; everything else fails with a named reason.
  */
object WebpCodec {

  /** A decoded lossless image: per-pixel 0xAARRGGBB, row-major. */
  final case class Argb(width: Int, height: Int, argb: Array[Int])

  def isWebp(b: Array[Byte]): Boolean =
    b != null && b.length >= 21 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P' &&
      b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'L' &&
      (b(20) & 0xff) == 0x2f

  /** CLC transmission order (VP8L spec §"Decoding the Code Lengths"). */
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private val GreenAlphabet = 256 + 24 // no color cache in this profile
  private val DistAlphabet = 40

  // ------------------------------------------------------------ bit I/O
  /** LSB-first bit writer (VP8L's bit order: bit 0 of a value lands in the
    * lowest unused bit of the current byte).
    */
  private final class BitWriter {
    private var buf = new Array[Byte](1 << 12)
    private var bytePos = 0
    private var bitPos = 0

    private def ensure(): Unit =
      if (bytePos >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)

    def writeBit(b: Int): Unit = {
      ensure()
      if ((b & 1) != 0) buf(bytePos) = (buf(bytePos) | (1 << bitPos)).toByte
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
    }

    /** n bits of v, LSB first — header fields, extra bits, CLC lengths. */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >>> i) & 1); i += 1 }
    }

    /** A canonical Huffman code: its bits go on the wire MSB-first (the
      * bit-reversed form libwebp stores pre-reversed and writes LSB-first
      * — identical wire order).
      */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >>> i) & 1); i -= 1 }
    }

    def toBytes: Array[Byte] =
      java.util.Arrays.copyOf(buf, bytePos + (if (bitPos > 0) 1 else 0))
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int, endByte: Int) {
    private var bytePos = startByte
    private var bitPos = 0

    def bit(): Int = {
      require(bytePos < endByte, "truncated VP8L bitstream")
      val b = (bytes(bytePos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // --------------------------------------------- canonical prefix codes
  /** Length-limited Huffman code lengths from frequencies: heap Huffman,
    * then cap at `maxLen` with a Kraft repair (lengthen the deepest
    * still-shortenable leaves until the code is feasible). Slightly
    * suboptimal after repair, always valid.
    */
  private[graft] def huffLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val n = freq.length
    val lens = new Array[Int](n)
    val used = (0 until n).filter(freq(_) > 0L)
    if (used.isEmpty) return lens
    if (used.size == 1) { lens(used.head) = 1; return lens }
    // heap Huffman over (weight, node); internal nodes track children
    case class Node(w: Long, sym: Int, l: Node, r: Node)
    val pq = new java.util.PriorityQueue[Node](used.size,
      (a: Node, b: Node) => java.lang.Long.compare(a.w, b.w))
    used.foreach(s => pq.add(Node(freq(s), s, null, null)))
    while (pq.size > 1) {
      val a = pq.poll(); val b = pq.poll()
      pq.add(Node(a.w + b.w, -1, a, b))
    }
    def walk(nd: Node, d: Int): Unit =
      if (nd.sym >= 0) lens(nd.sym) = math.max(1, d)
      else { walk(nd.l, d + 1); walk(nd.r, d + 1) }
    walk(pq.poll(), 0)
    if (lens.max > maxLen) {
      var i = 0
      while (i < n) { if (lens(i) > maxLen) lens(i) = maxLen; i += 1 }
      // Kraft sum in units of 2^-maxLen
      def kraft: Long =
        (0 until n).map(s => if (lens(s) > 0) 1L << (maxLen - lens(s)) else 0L).sum
      while (kraft > (1L << maxLen)) {
        // lengthen the deepest leaf that can still grow
        var pick = -1
        var i2 = 0
        while (i2 < n) {
          if (lens(i2) > 0 && lens(i2) < maxLen &&
            (pick < 0 || lens(i2) > lens(pick))) pick = i2
          i2 += 1
        }
        require(pick >= 0, "Kraft repair failed (too many symbols for maxLen)")
        lens(pick) += 1
      }
      // the lengthen loop can overshoot BELOW 2^maxLen — an INCOMPLETE
      // code, which strict decoders (libwebp's BuildHuffmanTable) reject.
      // Fill the deficit by shortening the deepest shortenable leaves;
      // every contribution is a multiple of the smallest one present, so
      // the greedy always lands exactly on zero.
      var deficit = (1L << maxLen) - kraft
      while (deficit > 0) {
        var pick = -1
        var i3 = 0
        while (i3 < n) {
          if (lens(i3) > 1 && (1L << (maxLen - lens(i3))) <= deficit &&
            (pick < 0 || lens(i3) > lens(pick))) pick = i3
          i3 += 1
        }
        require(pick >= 0, "Kraft completion failed")
        deficit -= 1L << (maxLen - lens(pick))
        lens(pick) -= 1
      }
    }
    lens
  }

  /** Canonical code values (MSB-first) from lengths — symbols sorted by
    * (length, symbol), codes assigned in that order per length.
    */
  private[graft] def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = if (lens.isEmpty) 0 else lens.max
    val codes = new Array[Int](lens.length)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      var s = 0
      while (s < lens.length) {
        if (lens(s) == l) { codes(s) = code; code += 1 }
        s += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  private sealed trait PrefixDecoder { def read(r: BitReader): Int }

  /** One symbol: a zero-bit code. Two symbols: one bit, 0 → the smaller
    * symbol (the canonical order over two length-1 codes).
    */
  private final class SimpleDecoder(s0: Int, s1: Int) extends PrefixDecoder {
    def read(r: BitReader): Int =
      if (s1 < 0) s0
      else if (r.bit() == 0) math.min(s0, s1)
      else math.max(s0, s1)
  }

  /** Canonical decoder: walk the stream bit by bit accumulating an
    * MSB-first value; at each length test the canonical window.
    */
  private final class Decoder(lens: Array[Int]) extends PrefixDecoder {
    private val maxLen = if (lens.forall(_ == 0)) 0 else lens.max
    private val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    private val firstCode = new Array[Int](maxLen + 2)
    private val firstIdx = new Array[Int](maxLen + 2)
    private val symbols: Array[Int] = {
      val order = (0 until lens.length).filter(lens(_) > 0)
        .sortBy(s => (lens(s), s)).toArray
      var code = 0
      var idx = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code; firstIdx(l) = idx
        code = (code + count(l)) << 1
        idx += count(l)
        l += 1
      }
      order
    }
    require(symbols.nonEmpty, "empty prefix code")

    def read(r: BitReader): Int = {
      var code = 0
      var l = 0
      while (true) {
        code = (code << 1) | r.bit()
        l += 1
        require(l <= maxLen, "prefix code overruns its max length (corrupt stream)")
        if (count(l) > 0 && code - firstCode(l) < count(l) && code >= firstCode(l))
          return symbols(firstIdx(l) + code - firstCode(l))
      }
      -1 // unreachable
    }
  }

  // -------------------------------------------- prefix-code (de)serialization
  /** Serialize one prefix code for `lens` over `alphabet` symbols: the
    * SIMPLE form when ≤2 used symbols all ≤255, the FULL
    * code-length-code form otherwise (zero runs via 17/18).
    */
  private def writePrefixCode(w: BitWriter, lens: Array[Int], codes: Array[Int]): Unit = {
    val used = lens.indices.filter(lens(_) > 0)
    require(used.nonEmpty, "a prefix code needs at least one symbol")
    if (used.size <= 2 && used.forall(_ <= 255)) {
      w.writeBits(1, 1) // simple
      w.writeBits(used.size - 1, 1)
      if (used.size == 1) {
        val s = used.head
        if (s <= 1) { w.writeBits(0, 1); w.writeBits(s, 1) }
        else { w.writeBits(1, 1); w.writeBits(s, 8) }
      } else {
        w.writeBits(1, 1) // first symbol as 8 bits
        w.writeBits(used.head, 8)
        w.writeBits(used(1), 8)
      }
      return
    }
    w.writeBits(0, 1) // full form
    // CLC symbol stream: literal lengths; zero runs as 17/18
    val stream = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (sym, extra)
    var i = 0
    while (i < lens.length) {
      if (lens(i) == 0) {
        var run = 0
        while (i + run < lens.length && lens(i + run) == 0) run += 1
        var left = run
        while (left >= 11) { val take = math.min(left, 138); stream += ((18, take - 11)); left -= take }
        if (left >= 3) { stream += ((17, left - 3)); left = 0 }
        while (left > 0) { stream += ((0, 0)); left -= 1 }
        i += run
      } else {
        stream += ((lens(i), 0))
        i += 1
      }
    }
    val clcFreq = new Array[Long](19)
    stream.foreach { case (s, _) => clcFreq(s) += 1 }
    // a single-symbol CLC would be a degenerate code; pad with a harmless
    // second symbol so the canonical code has ≥2 members
    if (clcFreq.count(_ > 0) == 1) {
      val have = clcFreq.indexWhere(_ > 0)
      clcFreq(if (have == 0) 1 else 0) = 1
    }
    val clcLens = huffLengths(clcFreq, 7)
    val clcCodes = canonicalCodes(clcLens)
    var numCl = 19
    while (numCl > 4 && clcLens(ClcOrder(numCl - 1)) == 0) numCl -= 1
    w.writeBits(numCl - 4, 4)
    var k = 0
    while (k < numCl) { w.writeBits(clcLens(ClcOrder(k)), 3); k += 1 }
    w.writeBits(0, 1) // no explicit max_symbol
    stream.foreach { case (s, extra) =>
      w.writeCode(clcCodes(s), clcLens(s))
      if (s == 17) w.writeBits(extra, 3)
      else if (s == 18) w.writeBits(extra, 7)
    }
  }

  /** Read one prefix code's lengths for an `alphabet`-symbol code. */
  private def readPrefixCode(r: BitReader, alphabet: Int): PrefixDecoder = {
    if (r.bits(1) == 1) { // simple
      val numSymbols = r.bits(1) + 1
      val first8 = r.bits(1)
      val s0 = if (first8 == 1) r.bits(8) else r.bits(1)
      require(s0 < alphabet, s"simple-code symbol $s0 beyond alphabet $alphabet")
      if (numSymbols == 2) {
        val s1 = r.bits(8)
        require(s1 < alphabet && s1 != s0, s"bad second simple-code symbol $s1")
        return new SimpleDecoder(s0, s1)
      }
      return new SimpleDecoder(s0, -1)
    }
    val lens = new Array[Int](alphabet)
    val numCl = 4 + r.bits(4)
    require(numCl <= 19, s"bad code-length count $numCl")
    val clcLens = new Array[Int](19)
    var k = 0
    while (k < numCl) { clcLens(ClcOrder(k)) = r.bits(3); k += 1 }
    val clc = new Decoder(clcLens)
    var maxSymbol =
      if (r.bits(1) == 1) {
        val lengthNBits = 2 + 2 * r.bits(3)
        2 + r.bits(lengthNBits)
      } else alphabet
    var symbol = 0
    var prev = 8
    while (symbol < alphabet && maxSymbol > 0) {
      maxSymbol -= 1
      val s = clc.read(r)
      if (s < 16) {
        lens(symbol) = s; symbol += 1
        if (s != 0) prev = s
      } else {
        val (rep, len) = s match {
          case 16 => (3 + r.bits(2), prev)
          case 17 => (3 + r.bits(3), 0)
          case 18 => (11 + r.bits(7), 0)
        }
        require(symbol + rep <= alphabet, "code-length repeat overruns the alphabet")
        var j = 0
        while (j < rep) { lens(symbol) = len; symbol += 1; j += 1 }
      }
    }
    new Decoder(lens)
  }

  // ------------------------------------------------------------- encode
  def encode(img: Argb): Array[Byte] = {
    require(img.width > 0 && img.width <= (1 << 14) &&
      img.height > 0 && img.height <= (1 << 14), s"bad dims ${img.width}x${img.height}")
    require(img.argb.length == img.width * img.height, "raster size mismatch")
    val w = new BitWriter
    w.writeBits(img.width - 1, 14)
    w.writeBits(img.height - 1, 14)
    val hasAlpha = img.argb.exists(p => (p >>> 24) != 0xff)
    w.writeBits(if (hasAlpha) 1 else 0, 1)
    w.writeBits(0, 3) // version
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta prefix image
    // channel histograms
    val fG = new Array[Long](GreenAlphabet)
    val fR = new Array[Long](256); val fB = new Array[Long](256)
    val fA = new Array[Long](256)
    img.argb.foreach { p =>
      fG((p >>> 8) & 0xff) += 1
      fR((p >>> 16) & 0xff) += 1
      fB(p & 0xff) += 1
      fA((p >>> 24) & 0xff) += 1
    }
    def emit(freq: Array[Long]): (Array[Int], Array[Int]) = {
      val lens = huffLengths(freq, 15)
      val codes = canonicalCodes(lens)
      writePrefixCode(w, lens, codes)
      // a simple ONE-symbol code is a zero-bit code on the wire: writeCode
      // must then emit nothing per occurrence (the decoder reads no bits)
      if (lens.count(_ > 0) == 1 && lens.indexWhere(_ > 0) <= 255)
        (new Array[Int](lens.length), codes)
      else (lens, codes)
    }
    val (gL, gC) = emit(fG)
    val (rL, rC) = emit(fR)
    val (bL, bC) = emit(fB)
    val (aL, aC) = emit(fA)
    // distance code: unused in a literal-only stream — one dummy symbol
    val dLens = new Array[Int](DistAlphabet); dLens(0) = 1
    writePrefixCode(w, dLens, canonicalCodes(dLens))
    // literals, G-R-B-A per pixel (simple one-symbol codes cost 0 bits)
    img.argb.foreach { p =>
      val g = (p >>> 8) & 0xff
      w.writeCode(gC(g), gL(g))
      val r = (p >>> 16) & 0xff
      w.writeCode(rC(r), rL(r))
      val b = p & 0xff
      w.writeCode(bC(b), bL(b))
      val a = (p >>> 24) & 0xff
      w.writeCode(aC(a), aL(a))
    }
    val payload = w.toBytes
    // RIFF container: 'VP8L' chunk holds signature byte + bitstream
    val chunkLen = 1 + payload.length
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = chunkLen + (chunkLen & 1)
    tag("RIFF"); u32(4 + 8 + padded); tag("WEBP"); tag("VP8L"); u32(chunkLen)
    out.write(0x2f)
    out.write(payload, 0, payload.length)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ------------------------------------------------------------- decode
  def decode(bytes: Array[Byte]): Argb = {
    require(isWebp(bytes), "not a lossless WebP payload (RIFF/WEBP/VP8L)")
    val riffLen = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8) |
      ((bytes(6) & 0xff) << 16) | ((bytes(7) & 0xff) << 24)
    require(riffLen + 8 <= bytes.length, "truncated RIFF container")
    val chunkLen = (bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
      ((bytes(18) & 0xff) << 16) | ((bytes(19) & 0xff) << 24)
    require(chunkLen >= 1 && 20 + chunkLen <= bytes.length, "truncated VP8L chunk")
    val r = new BitReader(bytes, 21, 20 + chunkLen)
    val width = r.bits(14) + 1
    val height = r.bits(14) + 1
    r.bits(1) // alpha hint
    require(r.bits(3) == 0, "unknown VP8L version")
    require(r.bits(1) == 0, "pixel transforms are outside this profile")
    require(r.bits(1) == 0, "the color cache is outside this profile")
    require(r.bits(1) == 0, "meta prefix images are outside this profile")
    val green = readPrefixCode(r, GreenAlphabet)
    val red = readPrefixCode(r, 256)
    val blue = readPrefixCode(r, 256)
    val alpha = readPrefixCode(r, 256)
    readPrefixCode(r, DistAlphabet) // distance code present per spec, unused
    val out = new Array[Int](width * height)
    var i = 0
    while (i < out.length) {
      val g = green.read(r)
      require(g < 256,
        s"green symbol $g is an LZ77 length code — backrefs are outside this profile")
      val rr = red.read(r)
      val bb = blue.read(r)
      val aa = alpha.read(r)
      out(i) = (aa << 24) | (rr << 16) | (g << 8) | bb
      i += 1
    }
    Argb(width, height, out)
  }

  // -------------------------------------------------------------- synth
  /** Closed-form ARGB law — ≤64 distinct values per channel (stride-37
    * index through a 64-step ramp), so the literal entropy coder genuinely
    * compresses, and every feature replays in SQL with no codec:
    * `c(p) = (seed·149 + ((p·37) mod 64)·3 + k·97) mod 256` for channel
    * k ∈ {0=R, 1=G, 2=B}, alpha 255.
    */
  def synthArgb(seed: Long, width: Int, height: Int): Argb = {
    val n = width * height
    val px = new Array[Int](n)
    var p = 0
    while (p < n) {
      val base = seed * 149L + ((p * 37L) % 64L) * 3L
      val r = ((base) % 256L).toInt
      val g = ((base + 97L) % 256L).toInt
      val b = ((base + 194L) % 256L).toInt
      px(p) = 0xff000000 | (r << 16) | (g << 8) | b
      p += 1
    }
    Argb(width, height, px)
  }

  def synth(seed: Long, width: Int, height: Int): Array[Byte] =
    encode(synthArgb(seed, width, height))

  /** Nearest-neighbor ARGB resize, the same integer source mapping as
    * `BmpCodec.resizeNearest`.
    */
  def resizeNearest(img: Argb, tw: Int, th: Int): Argb = {
    require(tw > 0 && th > 0)
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        out(y * tw + x) = img.argb(sy * img.width + (x.toLong * img.width / tw).toInt)
        x += 1
      }
      y += 1
    }
    Argb(tw, th, out)
  }
}
