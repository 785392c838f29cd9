package graft.ops

/** H.264/AVC STRUCTURAL codec (ITU-T H.264 / ISO 14496-10, public spec):
  * the Annex-B byte stream, NAL units, emulation prevention, exp-Golomb,
  * sequence/picture parameter sets (including frame cropping), slice
  * headers, and access-unit boundaries — everything a frame-sampling
  * pipeline needs to walk REAL coded pictures out of a real bitstream.
  *
  * What is real here: start-code scanning (3- and 4-byte), the
  * 00 00 03 emulation-prevention layer both directions, MSB-first bit IO
  * with ue(v)/se(v), SPS parsing through cropping with the 4:2:0
  * CropUnit law (width = 16·mbs − 2·(crop_l+crop_r) when
  * frame_mbs_only), PPS pps→sps binding, slice-header parsing through
  * frame_num, and the spec's primary-picture boundary rule
  * (first_mb_in_slice == 0 starts a new access unit — 7.4.1.2.4's
  * common case). Unsupported features fail LOUD BY NAME (interlaced
  * streams, POC type 1, high-profile chroma signalling, FMO slice
  * groups) — the FLAC honest-subset discipline.
  *
  * What is NOT in this file: slice-DATA decoding. I_PCM decodes below
  * ([[decodeIPcmSlice]]); CAVLC pixel decoding — intra prediction,
  * inter (P-slice) prediction with quarter-pel motion compensation,
  * and the in-loop deblocking filter — is REAL in [[H264Cavlc]], whose
  * [[H264Cavlc.decodeBaselineStream]] decodes whole conformant
  * baseline CAVLC videos (IDR + P) end to end. The one remaining
  * declared stub, failing loud by name at its dispatch point, is CABAC
  * entropy. Frame sampling digests the sampled access units' actual
  * coded bytes, the same level of realness as the AVI `movi` walk.
  *
  * [[synth]] writes structurally conformant baseline streams through
  * the same bit writer (full slice headers through slice_qp_delta,
  * emulation prevention applied, deterministic entropy-payload filler),
  * so fixtures carry every syntax element the parser reads.
  */
object H264Codec {

  // ---------- bit IO (shared with the CAVLC layer, H264Cavlc) ----------

  private[graft] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      // aligned byte fast path: PCM sample runs are byte-aligned by the
      // format, and the bit-by-bit loop was the synth cpu at scale
      if (n == 8 && nBits == 0) { out.write((v & 0xffL).toInt); return }
      var i = n - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** Exp-Golomb ue(v): leadingZeros(bits(v+1)−1) zeros then v+1. */
    def ue(v: Int): Unit = {
      require(v >= 0)
      val x = v + 1
      val len = 63 - java.lang.Long.numberOfLeadingZeros(x.toLong)
      bits(0L, len.toInt)
      bits(x.toLong, len.toInt + 1)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit then align. */
    def trailing(): Unit = { bit(1); while (nBits != 0) bit(0) }
    /** pcm_alignment_zero_bit run: plain zero-fill to the byte boundary. */
    def alignZero(): Unit = while (nBits != 0) bit(0)
    def toBytes: Array[Byte] = {
      require(nBits == 0, "unaligned RBSP (call trailing())")
      out.toByteArray
    }
  }

  private[graft] final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def u(n: Int): Int = {
      // aligned byte fast path (PCM sample runs — see BitWriter.bits)
      if (n == 8 && (pos & 7) == 0) {
        require(pos < b.length * 8, "RBSP exhausted mid-field")
        val v = b(pos >> 3) & 0xff
        pos += 8
        return v
      }
      var v = 0
      var i = 0
      while (i < n) {
        require(pos < b.length * 8, "RBSP exhausted mid-field")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // <= 30: at 31 the (1 << 31) − 1 prefix already overflows Int and
        // a hostile stream would read back a silently-wrong negative
        // value instead of this named failure (r14 review)
        require(zeros <= 30, "exp-Golomb code longer than 31 bits")
      }
      ((1 << zeros) - 1) + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    /** Skip pcm_alignment_zero_bits to the byte boundary. */
    def alignToByte(): Unit = while ((pos & 7) != 0) {
      require(u(1) == 0, "nonzero pcm alignment bit")
    }
  }

  // ---------- emulation prevention ----------

  /** Insert 0x03 after any 00 00 followed by 00/01/02/03. Tight index
    * loop into a pre-sized buffer — this runs once per NAL byte and was
    * the q_h264_pixels cpu after the bit-IO fast paths landed.
    */
  private[ops] def ep(raw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](raw.length + raw.length / 2 + 4)
    var n = 0
    var zeros = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (zeros >= 2 && (b & 0xff) <= 3) { out(n) = 3; n += 1; zeros = 0 }
      out(n) = b; n += 1
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Strip emulation prevention: 00 00 03 → 00 00. */
  private[ops] def unep(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new Array[Byte](nal.length - from)
    var n = 0
    var zeros = 0
    var i = from
    while (i < nal.length) {
      val v = nal(i)
      if (zeros >= 2 && v == 3) zeros = 0 // the EP byte itself: drop
      else {
        out(n) = v; n += 1
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  // ---------- parsing ----------

  final case class Sps(profileIdc: Int, levelIdc: Int, log2MaxFrameNum: Int,
                       pocType: Int, widthMbs: Int, heightMapUnits: Int,
                       cropL: Int, cropR: Int, cropT: Int, cropB: Int) {
    // 4:2:0 progressive: CropUnitX = CropUnitY = 2 (7-24/7-25)
    def width: Int = widthMbs * 16 - 2 * (cropL + cropR)
    def height: Int = heightMapUnits * 16 - 2 * (cropT + cropB)
  }

  final case class SliceInfo(nalType: Int, firstMb: Int, sliceType: Int,
                             frameNum: Int)

  final case class VideoInfo(sps: Sps, nFrames: Int, nIdr: Int)

  def isAnnexB(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 0 && p(1) == 0 &&
      (p(2) == 1 || (p(2) == 0 && p(3) == 1))

  /** NAL units of an Annex-B stream: (nal_unit_type, nal bytes including
    * the header byte, EP still applied). Lazy — huge streams walk
    * without materializing.
    */
  def nalUnits(p: Array[Byte]): Iterator[(Int, Array[Byte])] = new Iterator[(Int, Array[Byte])] {
    private var i = nextStart(0)
    private def nextStart(from: Int): Int = {
      var j = from
      while (j + 2 < p.length) {
        if (p(j) == 0 && p(j + 1) == 0 && p(j + 2) == 1) return j + 3
        j += 1
      }
      -1
    }
    def hasNext: Boolean = i >= 0 && i < p.length
    def next(): (Int, Array[Byte]) = {
      val start = i
      val nxt = nextStart(start)
      // a start code's leading zeros belong to the PREVIOUS nal's
      // trailing region; trim them (both 00 00 01 and 00 00 00 01 forms)
      var end = if (nxt < 0) p.length else nxt - 3
      while (end > start && p(end - 1) == 0) end -= 1
      i = nxt
      val nal = java.util.Arrays.copyOfRange(p, start, end)
      require(nal.nonEmpty && (nal(0) & 0x80) == 0,
        "forbidden_zero_bit set: not a NAL header")
      ((nal(0) & 0x1f), nal)
    }
  }

  def parseSps(nal: Array[Byte]): Sps = {
    val r = new BitReader(unep(nal, 1))
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // sps_id
    val highProfiles = Set(100, 110, 122, 244, 44, 83, 86, 118, 128)
    require(!highProfiles.contains(profile),
      s"high-profile chroma signalling unsupported (profile_idc $profile)")
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    pocType match {
      case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
      case 2 => ()
      case t => throw new IllegalArgumentException(
        s"pic_order_cnt_type $t unsupported (0 and 2 only)")
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed
    val wMbs = r.ue() + 1
    val hUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    require(frameMbsOnly == 1, "interlaced streams unsupported (frame_mbs_only_flag 0)")
    r.u(1) // direct_8x8_inference
    val (cl, cr, ct, cb) =
      if (r.u(1) == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
    Sps(profile, level, log2MaxFrameNum, pocType, wMbs, hUnits, cl, cr, ct, cb)
  }

  /** pps_id → sps_id, plus the FMO guard. */
  def parsePps(nal: Array[Byte]): (Int, Int) = {
    val p = parsePpsFull(nal)
    (p.ppsId, p.spsId)
  }

  /** The PPS fields the CAVLC pixel-decode layer consumes (7.3.2.2). */
  final case class Pps(ppsId: Int, spsId: Int, cabac: Boolean,
                       picInitQp: Int, chromaQpIndexOffset: Int,
                       deblockingControlPresent: Boolean,
                       constrainedIntraPred: Boolean,
                       redundantPicCntPresent: Boolean)

  /** Full baseline PPS parse (7.3.2.2), FMO-guarded like [[parsePps]]. */
  def parsePpsFull(nal: Array[Byte]): Pps = {
    val r = new BitReader(unep(nal, 1))
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.u(1) == 1
    r.u(1) // bottom_field_pic_order_in_frame_present
    require(r.ue() == 0, "FMO slice groups unsupported (num_slice_groups > 1)")
    // the P-slice parser reads ref_idx as te(v) with cMax 0 and no
    // pred_weight_table — a PPS that changes either would silently
    // desync every later slice bit, so both fail loud here (r14 review)
    require(r.ue() == 0,
      "multiple reference pictures unsupported (num_ref_idx_l0_default_active > 1)")
    r.ue() // num_ref_idx_l1_default_active_minus1 (B-slice territory, unread)
    require(r.u(1) == 0,
      "weighted prediction unsupported (weighted_pred_flag set)")
    r.u(2) // weighted_bipred_idc
    val picInitQp = 26 + r.se()
    r.se() // pic_init_qs_minus26
    val chromaOff = r.se()
    val deblockCtl = r.u(1) == 1
    val constrainedIntra = r.u(1) == 1
    val redundant = r.u(1) == 1
    require(picInitQp >= 0 && picInitQp <= 51, s"pic_init_qp $picInitQp out of range")
    require(chromaOff >= -12 && chromaOff <= 12,
      s"chroma_qp_index_offset $chromaOff out of range")
    Pps(ppsId, spsId, cabac, picInitQp, chromaOff, deblockCtl,
      constrainedIntra, redundant)
  }

  /** Slice header through frame_num — all the AU rule needs. */
  def parseSliceHeader(nal: Array[Byte], sps: Sps): SliceInfo = {
    val r = new BitReader(unep(nal, 1))
    val firstMb = r.ue()
    val sliceType = r.ue()
    r.ue() // pps_id
    val frameNum = r.u(sps.log2MaxFrameNum)
    SliceInfo(nal(0) & 0x1f, firstMb, sliceType, frameNum)
  }

  /** Whole-stream structural parse: dimensions from the SPS, access-unit
    * count from the primary-picture rule, IDR count from NAL types.
    */
  def info(p: Array[Byte]): VideoInfo = {
    var sps: Sps = null
    var nFrames = 0
    var nIdr = 0
    nalUnits(p).foreach { case (t, nal) =>
      t match {
        case 7 => sps = parseSps(nal)
        case 8 => parsePps(nal) // binding + FMO guard
        case 1 | 5 =>
          require(sps != null, "slice NAL before any SPS")
          val s = parseSliceHeader(nal, sps)
          if (s.firstMb == 0) { // new primary coded picture (7.4.1.2.4)
            nFrames += 1
            if (t == 5) nIdr += 1
          }
        case _ => () // SEI / AUD / filler: legal, no structural content
      }
    }
    require(sps != null, "no SPS in stream")
    VideoInfo(sps, nFrames, nIdr)
  }

  /** Every `every`-th access unit's first slice NAL — REAL coded-picture
    * bytes, lazily (the AVI `movi` walk's contract). (auIndex, nalBytes).
    */
  def sampledAccessUnits(p: Array[Byte], every: Int): Iterator[(Int, Array[Byte])] = {
    require(every > 0)
    var sps: Sps = null
    var au = -1
    nalUnits(p).flatMap { case (t, nal) =>
      t match {
        case 7 => sps = parseSps(nal); Iterator.empty
        case 1 | 5 =>
          require(sps != null, "slice NAL before any SPS")
          if (parseSliceHeader(nal, sps).firstMb == 0) {
            au += 1
            if (au % every == 0) Iterator((au, nal)) else Iterator.empty
          } else Iterator.empty
        case _ => Iterator.empty
      }
    }
  }

  // ---------- synthesis ----------

  /** Structurally conformant baseline (profile 66) Annex-B stream:
    * SPS + PPS + `nFrames` pictures (an IDR every `idrEvery`, P slices
    * between), each with a complete slice header and a deterministic
    * entropy-payload filler (the layer the engine's declared stub
    * covers). Cropping exercises the SPS law: width/height shrink by
    * 2·crop from the macroblock raster.
    */
  def synth(seed: Long, nFrames: Int, widthMb: Int, heightMb: Int,
            cropRight: Int = 0, cropBottom: Int = 0,
            idrEvery: Int = 10): Array[Byte] = {
    require(nFrames >= 1 && widthMb >= 1 && heightMb >= 1)
    require(cropRight * 2 < 16 && cropBottom * 2 < 16,
      "crop must stay inside the last macroblock")
    val out = new java.io.ByteArrayOutputStream()
    def nal(header: Int, rbsp: Array[Byte], long: Boolean): Unit = {
      if (long) out.write(0)
      out.write(0); out.write(0); out.write(1)
      out.write(header)
      val eped = ep(rbsp)
      out.write(eped, 0, eped.length)
    }
    // SPS (nal_ref_idc 3, type 7)
    val sps = new BitWriter
    sps.bits(66, 8) // profile_idc: baseline
    sps.bits(0xc0, 8) // constraint_set0/1, reserved zero
    sps.bits(30, 8) // level 3.0
    sps.ue(0) // sps_id
    sps.ue(0) // log2_max_frame_num_minus4 → 4-bit frame_num
    sps.ue(2) // pic_order_cnt_type 2: order = decode order, no POC bits
    sps.ue(1) // max_num_ref_frames
    sps.bit(0) // gaps_in_frame_num
    sps.ue(widthMb - 1)
    sps.ue(heightMb - 1)
    sps.bit(1) // frame_mbs_only
    sps.bit(1) // direct_8x8_inference
    if (cropRight > 0 || cropBottom > 0) {
      sps.bit(1); sps.ue(0); sps.ue(cropRight); sps.ue(0); sps.ue(cropBottom)
    } else sps.bit(0)
    sps.bit(0) // vui absent
    sps.trailing()
    nal(0x67, sps.toBytes, long = true)
    // PPS (type 8)
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps_id, sps_id
    pps.bit(0) // CAVLC
    pps.bit(0) // bottom_field_poc_present
    pps.ue(0) // one slice group
    pps.ue(0); pps.ue(0) // default ref list sizes − 1
    pps.bit(0) // weighted_pred
    pps.bits(0, 2) // weighted_bipred
    pps.se(0); pps.se(0); pps.se(0) // init qp/qs, chroma offset
    pps.bit(0); pps.bit(0); pps.bit(0) // deblock-ctrl, constrained-intra, redundant
    pps.trailing()
    nal(0x68, pps.toBytes, long = true)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nFrames) {
      val idr = i % idrEvery == 0
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice: AU boundary
      w.ue(if (idr) 7 else 5) // I / P (the all-slices-same-type spellings)
      w.ue(0) // pps_id
      // 7.4.3: an IDR picture SHALL carry frame_num 0, and frame_num
      // counts reference frames since the last IDR (mod 2^4 here) — the
      // r14 review caught the plain i%16 spelling violating both
      w.bits(((i % idrEvery) % 16).toLong, 4) // frame_num (log2 4)
      if (idr) w.ue(i / idrEvery) // idr_pic_id
      if (!idr) {
        w.bit(0) // num_ref_idx_active_override
        w.bit(0) // ref_pic_list_modification_l0
      }
      // dec_ref_pic_marking (nal_ref_idc > 0)
      if (idr) { w.bit(0); w.bit(0) } // no_output_of_prior, long_term
      else w.bit(0) // adaptive_ref_pic_marking_mode
      w.se(0) // slice_qp_delta
      w.trailing() // byte-align before the filler (real CAVLC continues
      // bit-contiguous from the header — that contiguity lives in the
      // stubbed residual layer, so alignment here is the honest seam)
      val header = w.toBytes
      // deterministic filler standing in for residual data (this is the
      // STRUCTURAL face; fully-decodable streams come from synthPcm and
      // H264Cavlc.synthCavlc); EP on write keeps start codes unemulable.
      // 7.4.1.1: the LAST byte of a NAL unit shall not be 0x00 (a reader
      // cannot tell it from start-code padding — nalUnits' trim would
      // silently eat it); lengths stay ≤ the 16-byte digest so copyOf
      // never zero-pads, and a digest that happens to END in 0x00 gets a
      // fixed non-zero tail byte (r14 review)
      md.reset()
      md.update(java.nio.ByteBuffer.allocate(12).putLong(seed).putInt(i).array())
      val fill = java.util.Arrays.copyOf(md.digest(), 8 + (((seed + i) % 8) + 1).toInt)
      if (fill(fill.length - 1) == 0) fill(fill.length - 1) = 0x3f
      nal(if (idr) 0x65 else 0x41, header ++ fill, long = false)
      i += 1
    }
    out.toByteArray
  }

  // ---------- I_PCM: the DECODABLE coding path ----------

  /** Deterministic PCM pixel laws — shared by [[synthPcm]], the decoder
    * spec, and the DuckDB oracle (which replays them as arithmetic with
    * no bitstream at all). `c` indexes the MB's chroma samples 0..127
    * (7.3.5: first 64 Cb, then 64 Cr).
    */
  def pcmLuma(seed: Long, frame: Int, mb: Int, p: Int): Int =
    ((seed * 131 + frame * 17 + mb * 7 + p * 3) % 256).toInt
  def pcmChroma(seed: Long, frame: Int, mb: Int, c: Int): Int =
    ((seed * 59 + frame * 13 + mb * 5 + c * 11 + 128) % 256).toInt

  /** Fully-decodable baseline stream: every picture an IDR I-slice whose
    * macroblocks are ALL I_PCM (mb_type 25 — raw samples, 7.3.5: byte
    * alignment then 256 luma + 128 chroma bytes per MB in 4:2:0). I_PCM
    * is the one H.264 coding path with NO entropy layer, so this stream
    * decodes to exact pixels end to end — the engine's declared stub
    * thereby narrows to exactly the CAVLC/CABAC residual paths.
    */
  def synthPcm(seed: Long, nFrames: Int, widthMb: Int, heightMb: Int): Array[Byte] = {
    require(nFrames >= 1 && widthMb >= 1 && heightMb >= 1)
    val out = new java.io.ByteArrayOutputStream()
    def nal(header: Int, rbsp: Array[Byte], long: Boolean): Unit = {
      if (long) out.write(0)
      out.write(0); out.write(0); out.write(1)
      out.write(header)
      val eped = ep(rbsp)
      out.write(eped, 0, eped.length)
    }
    val sps = new BitWriter
    sps.bits(66, 8); sps.bits(0xc0, 8); sps.bits(30, 8)
    sps.ue(0); sps.ue(0); sps.ue(2); sps.ue(1); sps.bit(0)
    sps.ue(widthMb - 1); sps.ue(heightMb - 1)
    sps.bit(1); sps.bit(1); sps.bit(0); sps.bit(0)
    sps.trailing()
    nal(0x67, sps.toBytes, long = true)
    val pps = new BitWriter
    pps.ue(0); pps.ue(0); pps.bit(0); pps.bit(0); pps.ue(0)
    pps.ue(0); pps.ue(0); pps.bit(0); pps.bits(0, 2)
    pps.se(0); pps.se(0); pps.se(0); pps.bit(0); pps.bit(0); pps.bit(0)
    pps.trailing()
    nal(0x68, pps.toBytes, long = true)
    val nMb = widthMb * heightMb
    var f = 0
    while (f < nFrames) {
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice
      w.ue(7) // slice_type: I (all slices of the picture)
      w.ue(0) // pps_id
      w.bits(0L, 4) // frame_num: every picture an IDR ⇒ always 0 (7.4.3)
      w.ue(f % 4) // idr_pic_id (alternating is enough; 7.4.3's rule is
      // about consecutive IDRs of the same picture)
      w.bit(0); w.bit(0) // dec_ref_pic_marking (IDR)
      w.se(0) // slice_qp_delta
      var mb = 0
      while (mb < nMb) {
        w.ue(25) // mb_type: I_PCM in an I slice
        w.alignZero() // pcm_alignment_zero_bit run
        var p = 0
        while (p < 256) { w.bits(pcmLuma(seed, f, mb, p).toLong, 8); p += 1 }
        var c = 0
        while (c < 128) { w.bits(pcmChroma(seed, f, mb, c).toLong, 8); c += 1 }
        mb += 1
      }
      w.trailing() // rbsp_slice_trailing_bits
      nal(0x65, w.toBytes, long = false)
      f += 1
    }
    out.toByteArray
  }

  /** Decoded planes of one all-I_PCM IDR slice: (luma W×H raster,
    * cb, cr at W/2×H/2). Raw-sample parse only — a compressed
    * (non-I_PCM) macroblock fails loud by name, which IS the engine's
    * declared stub boundary.
    */
  final case class PcmFrame(width: Int, height: Int, luma: Array[Byte],
                            cb: Array[Byte], cr: Array[Byte])

  def decodeIPcmSlice(nal: Array[Byte], sps: Sps): PcmFrame = {
    require((nal(0) & 0x1f) == 5, "I_PCM decode expects an IDR slice NAL")
    val r = new BitReader(unep(nal, 1))
    require(r.ue() == 0, "slice must start at macroblock 0")
    val st = r.ue()
    require(st == 2 || st == 7, s"not an I slice (slice_type $st)")
    r.ue() // pps_id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    r.u(2) // dec_ref_pic_marking (IDR, nal_ref_idc > 0)
    r.se() // slice_qp_delta
    val (wMb, hMb) = (sps.widthMbs, sps.heightMapUnits)
    // plausibility before allocation: a corrupt SPS can claim any ue
    // raster (Int overflow / multi-GB planes — an unnamed Error, not the
    // fail-loud contract), and the NAL must actually hold nMb·384 raw
    // sample bytes (r14 third review; covered by the PCM fuzz)
    require(wMb >= 1 && hMb >= 1 && wMb <= 1024 && hMb <= 1024,
      s"implausible raster ${wMb}x$hMb macroblocks")
    require(nal.length.toLong >= wMb.toLong * hMb * 384,
      s"NAL of ${nal.length} bytes cannot hold ${wMb * hMb} I_PCM macroblocks")
    val (w, h) = (wMb * 16, hMb * 16)
    val luma = new Array[Byte](w * h)
    val cb = new Array[Byte]((w / 2) * (h / 2))
    val cr = new Array[Byte]((w / 2) * (h / 2))
    var mb = 0
    while (mb < wMb * hMb) {
      val mbType = r.ue()
      require(mbType == 25,
        s"mb_type $mbType is entropy-coded — this raw-sample path decodes only I_PCM " +
          "(CAVLC intra pixel decode lives in H264Cavlc.decodeISlice)")
      r.alignToByte()
      val (mx, my) = (mb % wMb, mb / wMb)
      var p = 0
      while (p < 256) {
        luma((my * 16 + p / 16) * w + mx * 16 + p % 16) = r.u(8).toByte
        p += 1
      }
      var c = 0
      while (c < 128) {
        val plane = if (c < 64) cb else cr
        val k = c % 64
        plane((my * 8 + k / 8) * (w / 2) + mx * 8 + k % 8) = r.u(8).toByte
        c += 1
      }
      mb += 1
    }
    PcmFrame(w, h, luma, cb, cr)
  }
}
