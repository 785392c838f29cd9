package graft.ops

/** Pure-JVM AVI (RIFF) container walker — the REAL container behind the
  * multimodal tier's frame-sampling stage, completing the format trio:
  * BMP made decode real, WAV made resample real, this makes FRAME
  * EXTRACTION real. AVI is RIFF like WAV, but with NESTED LIST chunks —
  * the `hdrl` list carries the `avih` main header (frame count, geometry,
  * rate), the `movi` list carries one `00dc` chunk per frame — so the
  * walker exercises the recursion/pad-byte logic a flat WAV never hits.
  *
  * Scope: the container layer only. Frame PAYLOADS stay opaque bytes
  * (the pixel codec inside a frame is the declared stub seam, as with
  * JPEG) — but which bytes belong to which frame, how many frames exist,
  * and the header geometry are all real parses, which is exactly the part
  * of frame sampling that matters to a data pipeline (bounded fan-out,
  * per-frame provenance, never materializing the whole file's frames).
  */
object AviCodec {

  final case class Avi(width: Int, height: Int, microSecPerFrame: Int,
                       frames: IndexedSeq[Array[Byte]])

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 24 &&
      tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI "

  /** Decode the container: avih header fields + every frame's raw bytes.
    * Walks top-level chunks; recurses into LIST(hdrl) for `avih` and
    * LIST(movi) for `00dc`/`00db` frame chunks; skips everything else
    * (idx1, JUNK, strl) over its declared size plus the RIFF pad byte.
    */
  def decode(bytes: Array[Byte]): Avi = {
    require(isAvi(bytes), "not an AVI payload (missing RIFF/AVI magic)")
    var width, height, uspf = -1
    var declaredFrames = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = tag(bytes, off)
        val size = u32(bytes, off + 4)
        require(size >= 0 && off.toLong + 8L + size <= to,
          s"truncated chunk '$id' (size $size at offset $off)")
        id match {
          case "LIST" =>
            val listType = tag(bytes, off + 8)
            if (listType == "hdrl" || listType == "movi")
              walk(off + 12, off + 8 + size) // recurse into the list body
          case "avih" =>
            require(size >= 40, s"avih too small ($size)")
            uspf = u32(bytes, off + 8)
            declaredFrames = u32(bytes, off + 24)
            width = u32(bytes, off + 40)
            height = u32(bytes, off + 44)
          case "00dc" | "00db" =>
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
          case _ => // idx1/JUNK/strl/...: skip
        }
        off += 8 + size + (size & 1) // RIFF chunks pad to even offsets
      }
    }
    walk(12, bytes.length)
    require(uspf > 0 && width > 0 && height > 0, "no avih header found")
    require(declaredFrames == frames.length,
      s"avih declares $declaredFrames frames but movi carries ${frames.length}")
    Avi(width, height, uspf, frames.toIndexedSeq)
  }

  /** Encode: RIFF(AVI ) { LIST(hdrl){avih}, LIST(movi){00dc per frame} }.
    * Odd-sized frame chunks get the RIFF pad byte, so decode∘encode
    * exercises the padding path whenever a frame length is odd.
    */
  def encode(a: Avi): Array[Byte] = {
    val framesSize = a.frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + framesSize            // 'movi' type tag + chunks
    val hdrlSize = 4 + 8 + 56                // 'hdrl' + avih chunk(56)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) // 'AVI ' + lists
    val out = new Array[Byte](8 + riffSize)
    var off = 0
    def putTag(s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }; off += 4
    }
    def put32(v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte; off += 4
    }
    putTag("RIFF"); put32(riffSize); putTag("AVI ")
    putTag("LIST"); put32(hdrlSize); putTag("hdrl")
    putTag("avih"); put32(56)
    put32(a.microSecPerFrame); put32(0); put32(0); put32(0)
    put32(a.frames.length)     // dwTotalFrames
    put32(0); put32(1); put32(0)
    put32(a.width); put32(a.height)
    (0 until 4).foreach(_ => put32(0)) // dwReserved
    putTag("LIST"); put32(moviSize); putTag("movi")
    a.frames.foreach { f =>
      putTag("00dc"); put32(f.length)
      System.arraycopy(f, 0, out, off, f.length); off += f.length
      if ((f.length & 1) == 1) { out(off) = 0; off += 1 } // pad byte
    }
    require(off == out.length, s"encode size mismatch: $off vs ${out.length}")
    out
  }

  /** LAZY sampled-frame walk — the production shape of frame extraction:
    * locate the `movi` list, then step chunk to chunk yielding only every
    * `every`-th frame's bytes, never materializing the full frame list (a
    * 2-hour video's frames stream out of the iterator one at a time).
    */
  def sampledFrames(bytes: Array[Byte], every: Int): Iterator[(Int, Array[Byte])] = {
    require(isAvi(bytes), "not an AVI payload")
    require(every > 0)
    // top-level walk to find the movi list bounds
    var off = 12
    var moviFrom = -1
    var moviTo = -1
    while (off + 8 <= bytes.length && moviFrom < 0) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      require(size >= 0 && off.toLong + 8L + size <= bytes.length,
        s"truncated chunk '$id' at $off")
      if (id == "LIST" && tag(bytes, off + 8) == "movi") {
        moviFrom = off + 12; moviTo = off + 8 + size
      }
      off += 8 + size + (size & 1)
    }
    require(moviFrom >= 0, "no movi list found")
    new Iterator[(Int, Array[Byte])] {
      private var pos = moviFrom
      private var idx = 0
      private var pending: (Int, Array[Byte]) = null
      private def advance(): Unit = {
        while (pending == null && pos + 8 <= moviTo) {
          val id = tag(bytes, pos)
          val size = u32(bytes, pos + 4)
          require(size >= 0 && pos.toLong + 8L + size <= moviTo,
            s"truncated frame at $pos")
          if (id == "00dc" || id == "00db") {
            if (idx % every == 0)
              pending = (idx, java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size))
            idx += 1
          }
          pos += 8 + size + (size & 1)
        }
      }
      def hasNext: Boolean = { advance(); pending != null }
      def next(): (Int, Array[Byte]) = {
        advance()
        val r = pending; pending = null
        if (r == null) throw new NoSuchElementException
        r
      }
    }
  }

  /** Deterministic synthetic AVI — frame i's payload is the utf8 of the
    * pure-arithmetic law `"<seed>:<i>:" + "x"*(seed mod 50 + 1)`, so the
    * q_frame_sample oracle can recompute each sampled frame's md5 straight
    * from the law while Spark recovers the same bytes THROUGH the
    * container: synth → encode → chunk-walk → extract. A single
    * mis-walked boundary or dropped pad byte shifts every later frame and
    * breaks the hash.
    */
  def synthFrame(seed: Long, i: Int): Array[Byte] =
    (s"$seed:$i:" + "x" * ((seed % 50).toInt + 1))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def synth(seed: Long, nFrames: Int, width: Int = 64, height: Int = 48,
            microSecPerFrame: Int = 33366): Array[Byte] =
    encode(Avi(width, height, microSecPerFrame,
      IndexedSeq.tabulate(nFrames)(synthFrame(seed, _))))
}
