package graft.ops

/** Pure-JVM GIF89a codec — the palette-indexed ANIMATED image format, and
  * the sixth real codec in the multimodal tier (after BMP, PNG, JPEG, WAV,
  * AVI/MJPEG, FLAC). Everything is original Scala from the public GIF89a
  * specification (CompuServe, 1990) and the Welch LZW construction; the
  * reference repo (GennadyBr/DjangoAdmin_PostgreSQL_2_ElasticSeach) ships
  * no media handling at all — this tier is the 100 TB training-pipeline
  * north star the brief names, not a port.
  *
  * Supported surface (encoder writes exactly this; decoder validates it
  * loudly rather than guessing at the rest):
  *   - GIF89a header, logical screen descriptor, one GLOBAL color table
  *     (2..256 entries, power of two)
  *   - per-frame Graphics Control Extension (delay in centiseconds) and
  *     full-frame, non-interlaced image descriptors without local tables
  *   - real GIF-variant LZW for the pixel data: variable code width
  *     starting at minCodeSize+1, CLEAR/EOI codes, dictionary capped at
  *     4096 with an explicit CLEAR-and-reset when full, LSB-first bit
  *     packing into 255-byte sub-blocks
  *   - other extensions (comment, application, plain text) are walked
  *     over by their sub-block structure, as the spec requires
  *
  * Malformed streams fail loudly (truncation, bad magic, interlace or
  * local-table features the encoder never writes, pixel-count mismatches,
  * out-of-palette indexes, missing trailer) — consistent with the other
  * codecs' validation discipline.
  */
object GifCodec {

  /** One animation frame: GCE delay (centiseconds) + palette indexes,
    * row-major, exactly width·height of them.
    */
  final case class GifFrame(delayCs: Int, indexes: Array[Byte])

  /** A decoded GIF: one global palette (3 bytes per entry, RGB) and the
    * frame sequence.
    */
  final case class Gif(width: Int, height: Int, palette: Array[Byte],
                       frames: IndexedSeq[GifFrame])

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---------------------------------------------------------------- LZW --

  /** GIF-variant LZW decode of a raw code stream (sub-blocks already
    * concatenated) into exactly `expected` palette indexes.
    */
  private[ops] def lzwDecode(minCodeSize: Int, data: Array[Byte],
                             expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outN = 0
    // dictionary as prefix/suffix arrays; entries < clear are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    // LSB-first bit reader
    var acc = 0L; var nBits = 0; var pos = 0
    var done = false
    def readCode(): Int = {
      while (nBits < width) {
        require(pos < data.length, "LZW stream truncated before EOI")
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8; pos += 1
      }
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      c
    }
    def firstOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      // expand via prefix chain, writing backwards
      var len = 0
      var c = code
      while (c >= clear) { len += 1; c = prefix(c) }
      len += 1
      require(outN + len <= expected, "LZW emits more pixels than the raster holds")
      var at = outN + len - 1
      c = code
      while (c >= clear) { out(at) = suffix(c); at -= 1; c = prefix(c) }
      out(at) = c.toByte
      outN += len
    }
    while (!done) {
      val code = readCode()
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        require(code < clear, s"first code after CLEAR must be a root, got $code")
        require(outN < expected, "LZW emits more pixels than the raster holds")
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond dictionary ($next)")
        if (code < next) {
          emit(code)
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstOf(code); next += 1
          }
        } else { // KwKwK: str(prev) + first(prev)
          require(next < 4096, "KwKwK code with a full dictionary")
          prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
          emit(next - 1)
        }
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    require(outN == expected, s"LZW decoded $outN pixels, raster holds $expected")
    out
  }

  /** GIF-variant LZW encode: emits CLEAR up front, resets the dictionary
    * with an explicit CLEAR when it reaches 4096 entries, ends with EOI.
    * Returns the raw code stream (caller sub-blocks it).
    */
  private[ops] def lzwEncode(minCodeSize: Int, px: Array[Byte]): Array[Byte] = {
    require(px.nonEmpty, "cannot LZW-encode an empty raster")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = minCodeSize + 1
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nBits; nBits += width
      while (nBits >= 8) { bytes.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    // (prefixCode << 8 | symbol) -> code
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var next = eoi + 1
    putCode(clear)
    var w = px(0) & 0xff
    var i = 1
    while (i < px.length) {
      val s = px(i) & 0xff
      val key = Integer.valueOf((w << 8) | s)
      val hit = dict.get(key)
      if (hit != null) w = hit.intValue()
      else {
        putCode(w)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next)); next += 1
          // encoder grows one step AFTER the decoder's next==(1<<width)
          // add-side rule — the classic GIF off-by-one pairing
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          putCode(clear)
          dict = new java.util.HashMap[Integer, Integer](8192)
          next = eoi + 1; width = minCodeSize + 1
        }
        w = s
      }
      i += 1
    }
    putCode(w)
    // End-of-stream width desync, the classic GIF pitfall (found by
    // CodecFuzzSpec): mid-stream the encoder's dictionary runs ONE entry
    // ahead of the decoder's (the decoder adds nothing on the first
    // post-clear code) — which the (1<<width)+1 growth rule accounts
    // for — but the flush code just emitted adds NO encoder entry while
    // the decoder DOES add one, making the two counts equal. If that
    // lands exactly on a power of two the decoder widens before reading
    // EOI, so the encoder must widen here too.
    if (next == (1 << width) && width < 12) width += 1
    putCode(eoi)
    if (nBits > 0) bytes.write((acc & 0xff).toInt)
    bytes.toByteArray
  }

  // ------------------------------------------------------------- encode --

  def encode(g: Gif): Array[Byte] = {
    val palN = g.palette.length / 3
    require(palN >= 2 && palN <= 256 && Integer.bitCount(palN) == 1 &&
      g.palette.length == palN * 3, s"palette must be a power of two of RGB triples, got ${g.palette.length} bytes")
    require(g.width > 0 && g.width <= 0xffff && g.height > 0 && g.height <= 0xffff,
      s"bad dimensions ${g.width}x${g.height}")
    require(g.frames.nonEmpty, "a GIF needs at least one frame")
    // GCT size field and LZW min code size are INDEPENDENT: a 2-entry
    // palette has gctBits 1 but the spec floors the LZW root width at 2
    val gctBits = 32 - Integer.numberOfLeadingZeros(palN - 1)
    val minCodeSize = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    put16(g.width); put16(g.height)
    // GCT present, color resolution 8, GCT size field
    out.write(0x80 | 0x70 | (gctBits - 1))
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    out.write(g.palette)
    for (f <- g.frames) {
      require(f.indexes.length == g.width * g.height,
        s"frame holds ${f.indexes.length} pixels, raster is ${g.width}x${g.height}")
      require(f.delayCs >= 0 && f.delayCs <= 0xffff, s"bad delay ${f.delayCs}")
      var k = 0
      while (k < f.indexes.length) {
        require((f.indexes(k) & 0xff) < palN, s"index out of palette at $k")
        k += 1
      }
      // Graphics Control Extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // no disposal, no transparency
      put16(f.delayCs)
      out.write(0) // transparent index (unused)
      out.write(0) // terminator
      // Image descriptor: full frame, no LCT, not interlaced
      out.write(0x2c)
      put16(0); put16(0); put16(g.width); put16(g.height)
      out.write(0)
      out.write(minCodeSize)
      val code = lzwEncode(minCodeSize, f.indexes)
      var off = 0
      while (off < code.length) {
        val n = math.min(255, code.length - off)
        out.write(n)
        out.write(code, off, n)
        off += n
      }
      out.write(0) // data sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- decode --

  /** Header + global color table; returns (width, height, palette,
    * offset of the first block).
    */
  private def header(b: Array[Byte]): (Int, Int, Array[Byte], Int) = {
    require(isGif(b), "not a GIF stream (bad magic)")
    require(b.length >= 13, "truncated logical screen descriptor")
    val w = u16le(b, 6); val h = u16le(b, 8)
    val packed = b(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global color table is outside the supported surface")
    val palN = 1 << ((packed & 7) + 1)
    require(b.length >= 13 + 3 * palN, "truncated global color table")
    val pal = java.util.Arrays.copyOfRange(b, 13, 13 + 3 * palN)
    (w, h, pal, 13 + 3 * palN)
  }

  /** Walks sub-blocks from `pos`; returns the offset past the terminator.
    * With `sink` non-null, payload bytes are appended to it.
    */
  private def subBlocks(b: Array[Byte], pos0: Int,
                        sink: java.io.ByteArrayOutputStream): Int = {
    var pos = pos0
    while ({
      require(pos < b.length, "truncated sub-block chain")
      val n = b(pos) & 0xff
      pos += 1
      if (n > 0) {
        require(pos + n <= b.length, "truncated sub-block")
        if (sink != null) sink.write(b, pos, n)
        pos += n
      }
      n > 0
    }) ()
    pos
  }

  /** Lazy frame walk: header once, then one block at a time; only every
    * `every`-th frame's LZW data is DECOMPRESSED (skipped frames are
    * walked over by their sub-block lengths alone — the whole point for
    * frame sampling at scale). Yields (frameIdx, delayCs, indexes).
    */
  def sampledIndexFrames(b: Array[Byte], every: Int): Iterator[(Int, Int, Array[Byte])] = {
    require(every > 0, "sampling stride must be positive")
    val (w, h, pal, start) = header(b)
    val palN = pal.length / 3
    new Iterator[(Int, Int, Array[Byte])] {
      private var pos = start
      private var frameIdx = 0
      private var delayCs = 0
      private var pending: (Int, Int, Array[Byte]) = null
      private var ended = false
      private def advance(): Unit = {
        while (pending == null && !ended) {
          require(pos < b.length, "stream ends without a trailer")
          (b(pos) & 0xff) match {
            case 0x3b =>
              ended = true
            case 0x21 =>
              require(pos + 2 <= b.length, "truncated extension")
              val label = b(pos + 1) & 0xff
              if (label == 0xf9) {
                require(pos + 7 <= b.length && (b(pos + 2) & 0xff) == 4,
                  "malformed graphics control extension")
                delayCs = u16le(b, pos + 4)
                require((b(pos + 7) & 0xff) == 0, "GCE missing terminator")
                pos += 8
              } else pos = subBlocks(b, pos + 2, null)
            case 0x2c =>
              require(pos + 10 <= b.length, "truncated image descriptor")
              require(u16le(b, pos + 1) == 0 && u16le(b, pos + 3) == 0 &&
                u16le(b, pos + 5) == w && u16le(b, pos + 7) == h,
                "sub-rectangle frames are outside the supported surface")
              val packed = b(pos + 9) & 0xff
              require((packed & 0x80) == 0, "local color tables are outside the supported surface")
              val interlaced = (packed & 0x40) != 0
              require(pos + 11 <= b.length, "truncated LZW min code size")
              val minCode = b(pos + 10) & 0xff
              val take = frameIdx % every == 0
              if (take) {
                val sink = new java.io.ByteArrayOutputStream()
                pos = subBlocks(b, pos + 11, sink)
                val raw = lzwDecode(minCode, sink.toByteArray, w * h)
                // GIF89a interlace: rows arrive in four passes
                // (y=0 step 8; y=4 step 8; y=2 step 4; y=1 step 2) —
                // scatter them back to raster order. Our encoder never
                // interlaces, but conformant streams (the JDK writer
                // among them) do.
                val px =
                  if (!interlaced) raw
                  else {
                    val out = new Array[Byte](raw.length)
                    var src = 0
                    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                      var y = start
                      while (y < h) {
                        System.arraycopy(raw, src * w, out, y * w, w)
                        src += 1; y += step
                      }
                    }
                    out
                  }
                var k = 0
                while (k < px.length) {
                  require((px(k) & 0xff) < palN, s"pixel index beyond the $palN-entry palette")
                  k += 1
                }
                pending = (frameIdx, delayCs, px)
              } else pos = subBlocks(b, pos + 11, null)
              frameIdx += 1
              delayCs = 0
            case other =>
              throw new IllegalArgumentException(f"unknown GIF block 0x$other%02X")
          }
        }
      }
      def hasNext: Boolean = { advance(); pending != null }
      def next(): (Int, Int, Array[Byte]) = {
        advance()
        if (pending == null) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
  }

  /** [[sampledIndexFrames]] with the palette lookup applied — the RGB
    * comes through the palette PARSED FROM THE STREAM, so a feature face
    * built on this validates the color-table read too, not just the LZW.
    */
  def sampledRgbFrames(b: Array[Byte], every: Int): Iterator[(Int, Int, Array[Byte])] = {
    val (_, _, pal, _) = header(b)
    sampledIndexFrames(b, every).map { case (i, d, px) => (i, d, toRgb(pal, px)) }
  }

  def decode(b: Array[Byte]): Gif = {
    val (w, h, pal, _) = header(b)
    val frames = sampledIndexFrames(b, 1)
      .map { case (_, d, px) => GifFrame(d, px) }.toIndexedSeq
    require(frames.nonEmpty, "GIF with no image data")
    Gif(w, h, pal, frames)
  }

  /** Palette lookup: indexes → packed RGB bytes (3 per pixel). */
  def toRgb(palette: Array[Byte], indexes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](indexes.length * 3)
    var i = 0
    while (i < indexes.length) {
      val j = (indexes(i) & 0xff) * 3
      out(i * 3) = palette(j); out(i * 3 + 1) = palette(j + 1)
      out(i * 3 + 2) = palette(j + 2)
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize in INDEX space — palette-preserving, the same
    * integer source mapping as `BmpCodec.resizeNearest` (`sx = x·srcW/tw`),
    * applied per frame with delays kept. Index-space scaling is the
    * palette-format analog of raster scaling: no color arithmetic exists
    * that stays inside the palette, so nearest is the only faithful kernel.
    */
  def resizeNearest(g: Gif, tw: Int, th: Int): Gif = {
    require(tw > 0 && th > 0 && tw <= 0xffff && th <= 0xffff, s"bad target ${tw}x$th")
    val frames = g.frames.map { f =>
      val out = new Array[Byte](tw * th)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * g.height / th).toInt
        var x = 0
        while (x < tw) {
          out(y * tw + x) = f.indexes(sy * g.width + (x.toLong * g.width / tw).toInt)
          x += 1
        }
        y += 1
      }
      GifFrame(f.delayCs, out)
    }
    Gif(tw, th, g.palette, frames)
  }

  // -------------------------------------------------------------- synth --

  /** Closed-form 64-entry palette: `pal[j] = (41j, 97j, 163j) mod 256` —
    * pure integer arithmetic the DuckDB oracle replays with no codec.
    */
  def synthPalette(): Array[Byte] = {
    val pal = new Array[Byte](64 * 3)
    var j = 0
    while (j < 64) {
      pal(3 * j) = ((41 * j) % 256).toByte
      pal(3 * j + 1) = ((97 * j) % 256).toByte
      pal(3 * j + 2) = ((163 * j) % 256).toByte
      j += 1
    }
    pal
  }

  /** Frame `i`'s index law: `idx(p) = (seed·131 + i·977 + p·37) mod 64`.
    * The stride-37 walk is period-64 (37 ⊥ 64), so LZW genuinely
    * compresses it; rasters whose pixel count is NOT a multiple of 64
    * leave a partial-period tail whose sum depends on the frame offset —
    * which is what makes the per-frame channel sums sensitive to frame
    * identity and decode correctness rather than collapsing to a constant.
    */
  def synthIndexes(seed: Long, i: Int, nPx: Int): Array[Byte] = {
    val out = new Array[Byte](nPx)
    var p = 0
    while (p < nPx) {
      out(p) = ((seed * 131L + i * 977L + p * 37L) % 64L).toByte
      p += 1
    }
    out
  }

  /** Deterministic animated GIF: delay law `4 + (i mod 6)` cs. */
  def synth(seed: Long, nFrames: Int, width: Int, height: Int): Array[Byte] = {
    val frames = IndexedSeq.tabulate(nFrames)(i =>
      GifFrame(4 + (i % 6), synthIndexes(seed, i, width * height)))
    encode(Gif(width, height, synthPalette(), frames))
  }
}
