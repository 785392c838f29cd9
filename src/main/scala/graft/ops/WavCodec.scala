package graft.ops

/** Pure-JVM WAV (RIFF/WAVE PCM) codec — the REAL codec behind the
  * multimodal tier's AUDIO arm, the second format (after [[BmpCodec]])
  * where payload → samples → features runs an actual decoder end-to-end
  * instead of the deterministic stub.
  *
  * Supported: the canonical 16-bit mono PCM form (format tag 1). The
  * decoder is a real chunk walker — it skips unknown chunks (LIST/INFO,
  * fact, cue) with their RIFF pad bytes and tolerates `fmt `/`data` in
  * either order, which is the part of WAV parsing that actually bites
  * (most "simple" readers hardcode byte 44 and break on any extra chunk).
  * Encode always writes the canonical 44-byte-header form, so
  * encode∘decode round-trips samples and rate exactly (MultimodalSpec
  * pins it, including a hand-built file with a junk chunk before `data`).
  */
object WavCodec {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 44 &&
      tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE"

  /** Decode 16-bit mono PCM. Walks the chunk list: `fmt ` fixes the
    * format, `data` carries little-endian samples, anything else is
    * skipped over its declared size plus the RIFF odd-size pad byte.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV payload (missing RIFF/WAVE magic)")
    var off = 12
    var rate = -1
    var fmtOk = false
    var data: Array[Short] = null
    while (off + 8 <= bytes.length && (data == null || !fmtOk)) {
      val id = tag(bytes, off)
      val size = i32(bytes, off + 4)
      require(size >= 0 && off.toLong + 8L + size <= bytes.length,
        s"truncated chunk '$id' (size $size at offset $off)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          val fmtTag = u16(bytes, off + 8)
          val channels = u16(bytes, off + 10)
          rate = i32(bytes, off + 12)
          val bits = u16(bytes, off + 22)
          require(fmtTag == 1, s"unsupported format tag $fmtTag (PCM only)")
          require(channels == 1, s"unsupported channel count $channels (mono only)")
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
          require(rate > 0 && rate <= 384000, s"implausible sample rate $rate")
          fmtOk = true
        case "data" =>
          require(size % 2 == 0, s"odd data size $size for 16-bit samples")
          val n = size / 2
          data = new Array[Short](n)
          var i = 0
          while (i < n) {
            data(i) = ((bytes(off + 8 + 2 * i) & 0xff) |
              (bytes(off + 9 + 2 * i) << 8)).toShort
            i += 1
          }
        case _ => // LIST/fact/cue/…: skip
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even offsets
    }
    require(fmtOk, "no fmt chunk found")
    require(data != null, "no data chunk found")
    Audio(rate, data)
  }

  /** Encode 16-bit mono PCM in the canonical 44-byte-header form. */
  def encode(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putTag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, a.sampleRate)
    put32(28, a.sampleRate * 2) // byte rate = rate * block align
    put16(32, 2)                // block align = channels * bytes/sample
    put16(34, 16)               // bits per sample
    putTag(36, "data"); put32(40, dataSize)
    var i = 0
    while (i < a.samples.length) {
      out(44 + 2 * i) = (a.samples(i) & 0xff).toByte
      out(45 + 2 * i) = ((a.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Nearest-neighbor resample — the audio analog of the image tier's
    * [[BmpCodec.resizeNearest]] (the "resize to training shape" stage).
    * Deterministic integer source mapping (si = i·fromRate/toRate), so the
    * resampled signal replays bit-for-bit anywhere.
    */
  def resampleNearest(a: Audio, toRate: Int): Audio = {
    require(toRate > 0)
    require(a.samples.nonEmpty, "cannot resample an empty signal")
    val n = ((a.samples.length.toLong * toRate) / a.sampleRate).toInt.max(1)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = a.samples(((i.toLong * a.sampleRate) / toRate).toInt
        .min(a.samples.length - 1))
      i += 1
    }
    Audio(toRate, out)
  }

  /** 64-dim embedding from REAL samples: mean |amplitude| over 64 equal
    * time bins, normalized to [-1, 1] — the deterministic signal-space
    * stand-in for an audio tower, computed from decoded samples rather
    * than a content hash. Integer sums throughout; the final division is
    * the only float step (mirrors [[BmpCodec.pixelEmbed]]).
    */
  def sampleEmbed(a: Audio): Array[Double] = {
    val n = a.samples.length
    require(n > 0, "cannot embed an empty signal (zero-sample data chunk)")
    Array.tabulate(64) { b =>
      val lo = (b.toLong * n / 64).toInt
      val hi = ((b + 1).toLong * n / 64).toInt.max(lo + 1).min(n)
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(a.samples(i).toInt); i += 1 }
      (s.toDouble / (hi - lo)) / 16383.5 - 1.0 // mean |s| in [0, 32767]
    }
  }

  /** Deterministic synthetic PCM — the test/ingest fixture generator. The
    * sample law is pure integer arithmetic replayable in ANY engine
    * (`(seed·131 + i·773) mod 4001 − 2000`), which is what lets the
    * q_audio_features oracle validate the encode∘decode round trip: DuckDB
    * recomputes features straight from the law, Spark computes them from
    * DECODED bytes — a single flipped bit in the codec breaks the match.
    */
  def synthSamples(seed: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => ((seed * 131 + i.toLong * 773) % 4001 - 2000).toShort)

  def synth(seed: Long, n: Int, rate: Int): Array[Byte] =
    encode(Audio(rate, synthSamples(seed, n)))
}
