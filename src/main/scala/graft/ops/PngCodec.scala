package graft.ops

/** Pure-JVM PNG codec — the second REAL image format behind the multimodal
  * decode seam, and the first COMPRESSED one: unlike BMP's raw raster walk,
  * PNG round-trips through actual DEFLATE (`java.util.zip`), per-chunk
  * CRC-32 verification, and the five scanline predictors (None/Sub/Up/
  * Average/Paeth), so the decode path exercises a codec pipeline shaped
  * like the JPEG/WebP ones a production build would drop in.
  *
  * Supported: 8-bit truecolor (color type 2), non-interlaced — the PNG
  * every screenshot tool emits. Encode cycles the filter type per row
  * (y mod 5), so a single synthetic image exercises ALL five predictors
  * and the oracle-validated round trip (q_image_features) covers each one.
  *
  * Reference scope: the source system stores media as opaque blobs and
  * never decodes (`etl/json/` ships no codec tier); this closes the
  * training-pipeline gap the builder brief names (decode / resize /
  * feature-extract as first-class map-side stages).
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (0 until 8).forall(i => bytes(i) == Signature(i))

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an 8-bit truecolor non-interlaced PNG: chunk walk with CRC-32
    * verification, concatenated-IDAT inflate, per-row unfilter. Output is
    * the same top-down RGB array shape as [[BmpCodec.Image]], so the
    * resize / embed stages downstream are format-agnostic.
    */
  def decode(bytes: Array[Byte]): BmpCodec.Image = {
    require(isPng(bytes), "not a PNG payload (missing signature)")
    var width = 0; var height = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    var off = 8
    while (!sawIend) {
      require(off + 8 <= bytes.length, s"truncated chunk header at $off")
      val len = u32(bytes, off)
      require(len >= 0 && len <= Int.MaxValue - 12 &&
        off + 12L + len <= bytes.length, s"truncated chunk at $off (len $len)")
      val n = len.toInt
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(bytes, off + 4, 4 + n)
      require(crc.getValue == u32(bytes, off + 8 + n),
        s"CRC mismatch in '$typ' chunk at $off")
      typ match {
        case "IHDR" =>
          require(n == 13, s"bad IHDR length $n")
          width = u32(bytes, off + 8).toInt
          height = u32(bytes, off + 12).toInt
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 2, s"unsupported color type $colorType (RGB only)")
          require(interlace == 0, "interlaced PNG unsupported")
          require(width > 0 && height > 0 &&
            width <= (1 << 15) && height <= (1 << 15),
            s"implausible dimensions ${width}x$height")
          // LONG pixel cap: (3w+1)h wraps Int inside the per-dimension
          // allowance, which would crash allocation instead of rejecting
          require(width.toLong * height <= (1L << 28),
            s"raster ${width}x$height exceeds the 268M-pixel decode cap (well under the Int wrap; bounds buffers to ~1 GiB)")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(bytes, off + 8, n)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunk: CRC-checked, content skipped
      }
      off += 12 + n
    }
    require(sawIhdr, "no IHDR chunk")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, got, raw.length - got)
      require(k > 0 || inf.finished(), "stalled inflate (corrupt IDAT)")
      got += k
    }
    inf.end()
    require(got == raw.length, s"short pixel stream: $got of ${raw.length}")
    val rgb = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val left = if (i >= 3) rgb(dst + i - 3) & 0xff else 0
        val up = if (y > 0) rgb(dst - stride + i) & 0xff else 0
        val upLeft = if (y > 0 && i >= 3) rgb(dst - stride + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case 4 => x + paeth(left, up, upLeft)
          case t => throw new IllegalArgumentException(s"bad filter type $t in row $y")
        }
        rgb(dst + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    BmpCodec.Image(width, height, rgb)
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length.toLong), 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue), 0, 4)
  }

  /** Encode as 8-bit truecolor PNG. The filter type cycles `y mod 5`, so
    * every encoded image of height ≥ 5 exercises all five predictors on
    * the way back through [[decode]] — the round trip is a filter-coverage
    * test by construction, not just a byte copy.
    */
  def encode(img: BmpCodec.Image): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      val dst = y * (stride + 1) + 1
      val src = y * stride
      var i = 0
      while (i < stride) {
        val x = img.rgb(src + i) & 0xff
        val left = if (i >= 3) img.rgb(src + i - 3) & 0xff else 0
        val up = if (y > 0) img.rgb(src - stride + i) & 0xff else 0
        val upLeft = if (y > 0 && i >= 3) img.rgb(src - stride + i - 3) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - ((left + up) >> 1)
          case _ => x - paeth(left, up, upLeft)
        }
        raw(dst + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    def_.setInput(raw)
    def_.finish()
    val zipped = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!def_.finished()) {
      val k = def_.deflate(buf)
      zipped.write(buf, 0, k)
    }
    def_.end()
    val out = new java.io.ByteArrayOutputStream(zipped.size() + 64)
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (img.width >>> 24).toByte; ihdr(1) = (img.width >>> 16).toByte
    ihdr(2) = (img.width >>> 8).toByte; ihdr(3) = img.width.toByte
    ihdr(4) = (img.height >>> 24).toByte; ihdr(5) = (img.height >>> 16).toByte
    ihdr(6) = (img.height >>> 8).toByte; ihdr(7) = img.height.toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zipped.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic synthetic PNG with an ORACLE-REPLAYABLE pixel law:
    * `rgb[k] = (seed·131 + k·773) mod 256` (k = linear byte index of the
    * top-down RGB raster). Pure non-negative integer arithmetic, so a
    * second engine recomputes any pixel — and any integer feature of the
    * raster — without a codec, while the Spark side recovers the same
    * bytes THROUGH encode (filter + deflate + CRC) ∘ decode.
    */
  def synth(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(seed >= 0, "pixel law assumes a non-negative seed")
    val rgb = new Array[Byte](width * height * 3)
    var k = 0
    while (k < rgb.length) {
      rgb(k) = ((seed * 131 + k.toLong * 773) % 256).toByte
      k += 1
    }
    encode(BmpCodec.Image(width, height, rgb))
  }
}
