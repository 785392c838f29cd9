package graft

import graft.ops.{H264Cavlc, H264Codec}

/** The H.264 CAVLC intra pixel-decode tier (the layer that was the
  * engine's last declared stub). Three verification directions, stated
  * with their limits:
  *
  *   1. STRUCTURAL table laws — every VLC table must be prefix-free
  *      with Kraft sum <= 1 (true of the spec's hand-designed Huffman
  *      codes), and the Table 9-4 cbp mapping must be a permutation of
  *      0..47. These catch transcription slips that break decodability;
  *      they cannot catch a wrong-but-still-prefix-free codeword (no
  *      independent H.264 decoder exists in this sandbox to check
  *      against — recorded in H264Cavlc's scaladoc).
  *   2. CLOSED-FORM oracle face — the DC-only stream's every pixel has
  *      a closed form this spec recomputes independently (and the
  *      DuckDB oracle replays again in SQL), pinning the whole chain
  *      bitstream → CAVLC → dequant → IDCT → prediction → placement.
  *   3. DIFFERENTIAL rich face — decoder output must equal the
  *      encoder's in-loop reconstruction bit-exactly across a sweep of
  *      law-driven streams (all mb types, all intra modes availability
  *      permits, qp walks 6..50, chroma DC+AC, I_PCM interleave). The
  *      bitstream writer and parser are independent code paths; the
  *      shared pure laws (transforms, prediction) are pinned by (2).
  */
class H264CavlcSpec extends SparkSpecBase {

  test("VLC tables: prefix-free, Kraft sum <= 1, no zero-length codes") {
    for ((name, codes) <- H264Cavlc.coeffTokenTables) {
      assert(codes.nonEmpty, name)
      for ((len, bits) <- codes) {
        assert(len >= 1 && len <= 16, s"$name: bad length $len")
        assert(bits >= 0 && bits < (1 << len), s"$name: bits $bits overflow len $len")
      }
      // prefix-freeness: no codeword is a prefix of another
      for (Seq((l1, b1), (l2, b2)) <- codes.combinations(2)) {
        val (sl, sb, ll, lb) = if (l1 <= l2) (l1, b1, l2, b2) else (l2, b2, l1, b1)
        assert(!(sl == ll && sb == lb), s"$name: duplicate codeword")
        assert((lb >> (ll - sl)) != sb,
          s"$name: ($sl,$sb) is a prefix of ($ll,$lb)")
      }
      val kraft = codes.map { case (l, _) => BigDecimal(1) / BigDecimal(1 << l) }.sum
      assert(kraft <= BigDecimal(1), s"$name: Kraft sum $kraft > 1")
    }
  }

  test("Table 9-4 intra cbp mapping is a permutation of 0..47 with the spec's head") {
    assert(H264Cavlc.cbpIntra.sorted.toSeq === (0 until 48))
    // the most-probable head: cbp 47, 31, 15, 0 get the shortest codes
    assert(H264Cavlc.cbpIntra.take(4).toSeq === Seq(47, 31, 15, 0))
  }

  test("residual block round trip: every coefficient pattern law writes, reads back identically") {
    for (seed <- 1L to 300L) {
      val h = H264Cavlc.mix(seed, 77L)
      val maxCoeff = (seed % 3) match {
        case 0 => 16
        case 1 => 15
        case _ => 4
      }
      val nC = if (maxCoeff == 4) -1 else (h % 10).toInt - 1 match {
        case n if n < 0 => 0
        case n => n
      }
      val coeffs = new Array[Int](maxCoeff)
      var k = 0
      while (k < maxCoeff) {
        val r = H264Cavlc.mix(h, k)
        if (r % 3 == 0) {
          val mag = (r % 7).toInt match {
            case 0 | 1 | 2 => 1
            case 3 | 4 => 2 + (r % 5).toInt
            case 5 => 20 + (r % 200).toInt
            // 1999 is the largest magnitude encodable at suffixLength 0
            // for 8-bit conformance (level_prefix <= 15; the decoder
            // tolerates up to 19 on hostile input, the encoder refuses)
            case _ => 1000 + (r % 1000).toInt
          }
          coeffs(k) = (if ((r >> 9) % 2 == 0) 1 else -1) * mag
        }
        k += 1
      }
      val w = new H264Codec.BitWriter
      H264Cavlc.writeResidualBlock(w, nC, coeffs)
      w.trailing()
      val r = new H264Codec.BitReader(w.toBytes)
      val (back, tc) = H264Cavlc.readResidualBlock(r, nC, maxCoeff)
      assert(back.toSeq === coeffs.toSeq, s"seed $seed nC=$nC maxCoeff=$maxCoeff")
      assert(tc === coeffs.count(_ != 0), s"seed $seed TotalCoeff")
    }
  }

  test("oracle face: decoded pixels equal the closed-form law — and the decoder equals the encoder recon") {
    for (seed <- 1L to 20L) {
      val (wMb, hMb) = (2 + (seed % 5).toInt, 1 + (seed % 3).toInt)
      val nFrames = 1 + (seed % 3).toInt
      val s = H264Cavlc.synthCavlc(seed, nFrames, wMb, hMb, rich = false)
      val nals = H264Codec.nalUnits(s.bytes).toVector
      val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
      val pps = H264Codec.parsePpsFull(nals.collectFirst { case (8, n) => n }.get)
      val slices = nals.collect { case (5, n) => n }
      assert(slices.length === nFrames)
      val (w, h) = (wMb * 16, hMb * 16)
      slices.zipWithIndex.foreach { case (nal, f) =>
        val dec = H264Cavlc.decodeISlice(nal, sps, pps)
        assert((dec.width, dec.height) === ((w, h)))
        // closed form: flat 4x4 blocks, v = 128 + 4 * column prefix sum
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) {
            val (gx, gy) = (px / 4, py / 4)
            var expect = 128
            var j = 1
            while (j <= gy) { expect += 4 * H264Cavlc.oracleLevel(seed, f, gx, j); j += 1 }
            assert(dec.luma(py * w + px) === expect,
              s"seed $seed frame $f pixel ($px,$py)")
            px += 1
          }
          py += 1
        }
        assert(dec.cb.forall(_ == 128) && dec.cr.forall(_ == 128),
          s"seed $seed frame $f chroma must be flat 128 (no residual, DC pred)")
        // and the encoder's own reconstruction loop agrees positionally
        assert(dec.luma.toSeq === s.frames(f).luma.toSeq, s"seed $seed frame $f recon")
      }
    }
  }

  test("rich face differential: decode == encoder reconstruction bit-exactly across the law sweep") {
    for (seed <- 1L to 30L) {
      val (wMb, hMb) = (1 + (seed % 5).toInt, 1 + (seed % 3).toInt)
      val nFrames = 1 + (seed % 2).toInt
      val s = H264Cavlc.synthCavlc(seed, nFrames, wMb, hMb, rich = true)
      val nals = H264Codec.nalUnits(s.bytes).toVector
      val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
      val pps = H264Codec.parsePpsFull(nals.collectFirst { case (8, n) => n }.get)
      val slices = nals.collect { case (5, n) => n }
      slices.zipWithIndex.foreach { case (nal, f) =>
        val dec = H264Cavlc.decodeISlice(nal, sps, pps)
        val ref = s.frames(f)
        assert(dec.luma.toSeq === ref.luma.toSeq, s"seed $seed frame $f luma")
        assert(dec.cb.toSeq === ref.cb.toSeq, s"seed $seed frame $f cb")
        assert(dec.cr.toSeq === ref.cr.toSeq, s"seed $seed frame $f cr")
      }
    }
  }

  test("the rich law sweep actually exercises every mb kind, every intra mode family, and the FLC nC regime") {
    // replay the laws the encoder uses — a sweep that silently stopped
    // covering I_PCM/I_16x16 (whose neighbors force nC >= 8) would
    // hollow out the differential above
    var kinds = Set.empty[Int]
    var modes4 = Set.empty[Int]
    for (seed <- 1L to 30L; f <- 0 until 2; mb <- 0 until 15) {
      val mh = H264Cavlc.mix(seed, f, mb, 2L)
      kinds += ((mh % 6).toInt match {
        case 5 => 2
        case 3 | 4 => 1
        case _ => 0
      })
      for (b <- 0 until 16)
        modes4 += (H264Cavlc.mix(mh, 12L, b) % 9).toInt
    }
    assert(kinds === Set(0, 1, 2), "mb kind law must hit I_NxN, I_16x16, I_PCM")
    assert(modes4.size === 9, "the 4x4 mode law must be able to reach all nine modes")
    // both deblocking regimes must appear in the sweep (idc law), else
    // the differential stops exercising the filter
    val idcs = (for (seed <- 1L to 30L; f <- 0 until 2)
      yield (H264Cavlc.mix(seed, f, 30L) % 2).toInt).toSet
    assert(idcs === Set(0, 1), "the idc law must hit filtered AND unfiltered frames")
  }

  test("stub boundaries fail loud by name: CABAC; and the PCM face cross-decodes through BOTH parsers") {
    val s = H264Cavlc.synthCavlc(3L, 1, 2, 1, rich = false)
    val nals = H264Codec.nalUnits(s.bytes).toVector
    val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
    val pps = H264Codec.parsePpsFull(nals.collectFirst { case (8, n) => n }.get)
    val slice = nals.collectFirst { case (5, n) => n }.get
    val eCabac = intercept[IllegalArgumentException] {
      H264Cavlc.decodeISlice(slice, sps, pps.copy(cabac = true))
    }
    assert(eCabac.getMessage.contains("CABAC"))
    // an all-I_PCM stream (PPS without deblocking control -> filter on
    // with zero offsets; I_PCM carries qP 0 so the filter is a no-op at
    // alpha(0) == 0) now decodes through BOTH independent parsers —
    // decodeISlice's full mb layer and decodeIPcmSlice's raw-sample
    // walk — and they must agree sample for sample
    val pcm = H264Codec.synthPcm(4L, 1, 2, 1)
    val pcmNals = H264Codec.nalUnits(pcm).toVector
    val pcmSps = H264Codec.parseSps(pcmNals.collectFirst { case (7, n) => n }.get)
    val pcmPps = H264Codec.parsePpsFull(pcmNals.collectFirst { case (8, n) => n }.get)
    val pcmSlice = pcmNals.collectFirst { case (5, n) => n }.get
    val full = H264Cavlc.decodeISlice(pcmSlice, pcmSps, pcmPps)
    val raw = H264Codec.decodeIPcmSlice(pcmSlice, pcmSps)
    assert(full.luma.toSeq === raw.luma.map(_ & 0xff).toSeq)
    assert(full.cb.toSeq === raw.cb.map(_ & 0xff).toSeq)
    assert(full.cr.toSeq === raw.cr.map(_ & 0xff).toSeq)
  }

  test("deblocking filter: hand-computed spec vectors (normal bS=3 luma, strong bS=4 luma, chroma), table anchors") {
    // Table 8-16/8-17 anchors + monotonicity
    assert(H264Cavlc.alphaTab.length === 52 && H264Cavlc.betaTab.length === 52)
    assert(H264Cavlc.alphaTab(15) === 0 && H264Cavlc.alphaTab(16) === 4
      && H264Cavlc.alphaTab(51) === 255)
    assert(H264Cavlc.betaTab(16) === 2 && H264Cavlc.betaTab(51) === 18)
    assert(H264Cavlc.tc0Tab.map(_.length).toSeq === Seq(52, 52, 52))
    assert(H264Cavlc.tc0Tab(0)(51) === 13 && H264Cavlc.tc0Tab(1)(51) === 17
      && H264Cavlc.tc0Tab(2)(51) === 25)
    for (t <- H264Cavlc.alphaTab +: H264Cavlc.betaTab +: H264Cavlc.tc0Tab.toSeq)
      assert(t.sliding(2).forall(p => p(0) <= p(1)), "tables are nondecreasing")
    for (i <- 0 until 52)
      assert(H264Cavlc.tc0Tab(0)(i) <= H264Cavlc.tc0Tab(1)(i)
        && H264Cavlc.tc0Tab(1)(i) <= H264Cavlc.tc0Tab(2)(i), s"tc0 rows ordered at $i")
    // normal filter, bS=3, indexA=indexB=30 (alpha 25, beta 8, tc0 2):
    // line p3..p0|q0..q3 = 80,82,84,86|94,92,90,88 — hand arithmetic:
    // delta=3, p0'=89 q0'=91, ap/aq both on: p1'=86, q1'=90
    val a = Array(80, 82, 84, 86, 94, 92, 90, 88)
    H264Cavlc.filterLine(a, i => 3 - i, i => 4 + i, bS = 3,
      indexA = 30, indexB = 30, chroma = false)
    assert(a.toSeq === Seq(80, 82, 86, 89, 91, 90, 90, 88))
    // strong filter, bS=4, indexA=indexB=36 (alpha 50, beta 11), small
    // gap + ap + aq: full 3-tap form on both sides
    val b = Array(100, 102, 104, 106, 110, 108, 106, 104)
    H264Cavlc.filterLine(b, i => 3 - i, i => 4 + i, bS = 4,
      indexA = 36, indexB = 36, chroma = false)
    assert(b.toSeq === Seq(100, 103, 106, 106, 107, 108, 106, 104))
    // chroma strong filter: only p0/q0 move, 2-tap form
    val c = Array(100, 102, 104, 106, 110, 108, 106, 104)
    H264Cavlc.filterLine(c, i => 3 - i, i => 4 + i, bS = 4,
      indexA = 36, indexB = 36, chroma = true)
    assert(c.toSeq === Seq(100, 102, 104, 106, 108, 108, 106, 104))
  }

  test("inverse transform hand vectors: 8.5.12.2 and 8.5.10 basis responses pin the butterflies completely") {
    // Same blind spot as the intra predictors (ADVICE r14): idct4x4 and
    // ihadamard4x4 are PURE LAWS shared by the encoder reconstruction and
    // the decoder, so a mistranscribed tap passes every differential gate,
    // and the DC-only oracle face exercises only the DC path. Both
    // transforms are LINEAR, so pinning the response to each of the four
    // basis inputs determines them completely; rows and columns use the
    // same butterfly, so one row case + its transpose covers 2D. Expected
    // grids are the H.264 inverse-transform matrix columns by hand:
    //   core:     [1,1,1,1], [1,1/2,-1/2,-1], [1,-1,-1,1], [1/2,-1,1,-1/2]
    //   hadamard: [1,1,1,1], [1,1,-1,-1],     [1,-1,-1,1], [1,-1,1,-1]
    // (x64 input so the half taps stay integral).
    def basis(pos: Int): Array[Int] = {
      val d = new Array[Int](16); d(pos) = 64; d
    }
    val coreCols = Seq(
      Seq(64, 64, 64, 64), Seq(64, 32, -32, -64),
      Seq(64, -64, -64, 64), Seq(32, -64, 64, -32))
    for (x <- 0 to 3) {
      val out = H264Cavlc.idct4x4(basis(x)) // row-0 basis: columns constant
      for (y <- 0 to 3; xx <- 0 to 3)
        assert(out(y * 4 + xx) === coreCols(x)(xx),
          s"core row response diverges at basis $x, sample ($xx,$y)")
      val outT = H264Cavlc.idct4x4(basis(4 * x)) // col-0 basis: rows constant
      for (y <- 0 to 3; xx <- 0 to 3)
        assert(outT(y * 4 + xx) === coreCols(x)(y),
          s"core column response diverges at basis $x, sample ($xx,$y)")
    }
    val hadCols = Seq(
      Seq(64, 64, 64, 64), Seq(64, 64, -64, -64),
      Seq(64, -64, -64, 64), Seq(64, -64, 64, -64))
    for (x <- 0 to 3) {
      val out = H264Cavlc.ihadamard4x4(basis(x))
      for (y <- 0 to 3; xx <- 0 to 3)
        assert(out(y * 4 + xx) === hadCols(x)(xx),
          s"hadamard row response diverges at basis $x, sample ($xx,$y)")
      // transpose (column-impulse) case: without it the column pass is
      // exercised only through its d0 taps (r15 re-review)
      val outT = H264Cavlc.ihadamard4x4(basis(4 * x))
      for (y <- 0 to 3; xx <- 0 to 3)
        assert(outT(y * 4 + xx) === hadCols(x)(y),
          s"hadamard column response diverges at basis $x, sample ($xx,$y)")
    }
    // linearity cross-check on a mixed input: response = sum of scaled
    // basis responses (catches any input-dependent branch)
    val mixed = new Array[Int](16)
    mixed(0) = 64; mixed(1) = -128; mixed(6) = 192
    val got = H264Cavlc.idct4x4(mixed)
    val b0 = H264Cavlc.idct4x4(basis(0))
    val b1 = H264Cavlc.idct4x4(basis(1))
    val b6 = H264Cavlc.idct4x4(basis(6))
    for (k <- 0 to 15)
      assert(got(k) === b0(k) - 2 * b1(k) + 3 * b6(k), s"linearity breaks at $k")

    // residual4x4 end-to-end anchors: single coefficients through zig-zag
    // placement + dequant (Table LevelScale row qp%6=0: V=(10,16,13)) +
    // transform + (x+32)>>6. DC coeff 1 at qp 0: d(0)=10, every sample
    // (10+32)>>6 = 0; DC coeff 8: d(0)=80, (80+32)>>6 = 1.
    assert(H264Cavlc.residual4x4(Array.fill(16)(0).updated(0, 8), 0,
      acOnly = false, dc = 0).toSeq === Seq.fill(16)(1))
    // qp 6 doubles the scale ((c*V) << 1): DC coeff 4 -> d(0)=80 -> all 1
    assert(H264Cavlc.residual4x4(Array.fill(16)(0).updated(0, 4), 6,
      acOnly = false, dc = 0).toSeq === Seq.fill(16)(1))
    // acOnly scan coeff k=0 lands at zig-zag position 1 = raster (x=1,y=0)
    // — a MIXED-parity position, dequant class v_m2 = 13 at qp 0 (8.5.12.1
    // row m=0 is (10,16,13): both-even 10, both-odd 16, mixed 13). So
    // d(1) = 13·6 = 78, pre-round row response 78·[1,1/2,-1/2,-1] =
    // [78,39,-39,-78], and (x+32)>>6 floors to [1,1,-1,-1] on every row.
    val ac = H264Cavlc.residual4x4(Array.fill(15)(0).updated(0, 6), 0,
      acOnly = true, dc = 0)
    for (y <- 0 to 3)
      assert(Seq(ac(y * 4), ac(y * 4 + 1), ac(y * 4 + 2), ac(y * 4 + 3)) ===
        Seq(1, 1, -1, -1), s"AC zig-zag/dequant/transform chain diverges at row $y")
  }

  test("intra prediction hand vectors: every 4x4 mode, 16x16 Plane, chroma Plane against spec arithmetic") {
    // ADVICE r14: modes beyond DC/Vertical were proven only by
    // encoder-decoder self-consistency (both call the same predictor), so
    // a mistranscribed 8.3 formula would pass every gate. These expected
    // grids were computed BY HAND from clauses 8.3.1.2.3-8.3.1.2.9 /
    // 8.3.3.4 / 8.3.4.4 over an asymmetric neighbor line — mirroring the
    // deblocking and MC vector discipline.
    //
    // Neighbor setup (plane 16 wide, block at (4,4)):
    //   p[x,-1] = 10·(x+1) for x = 0..7   (10,20,...,80)
    //   p[-1,y] = 90+10y  for y = 0..3    (90,100,110,120)
    //   p[-1,-1] = 5
    val w = 16
    val plane = new Array[Int](w * 16)
    for (x <- 0 to 7) plane(3 * w + 4 + x) = 10 * (x + 1)
    for (y <- 0 to 3) plane((4 + y) * w + 3) = 90 + 10 * y
    plane(3 * w + 3) = 5
    def p4(mode: Int): Seq[Int] =
      H264Cavlc.predict4x4(plane, w, 4, 4, mode,
        leftAvail = true, topAvail = true, tlAvail = true, trAvail = true).toSeq
    // mode 0 Vertical: each row copies the top line
    assert(p4(0) === Seq(10, 20, 30, 40, 10, 20, 30, 40, 10, 20, 30, 40, 10, 20, 30, 40))
    // mode 1 Horizontal: each column copies the left line
    assert(p4(1) === Seq(90, 90, 90, 90, 100, 100, 100, 100, 110, 110, 110, 110, 120, 120, 120, 120))
    // mode 2 DC: (100 + 420 + 4) >> 3 = 65
    assert(p4(2) === Seq.fill(16)(65))
    // mode 3 Diagonal-Down-Left: 10(x+y)+20, corner (3,3) = (70+3·80+2)>>2 = 78
    assert(p4(3) === Seq(20, 30, 40, 50, 30, 40, 50, 60, 40, 50, 60, 70, 50, 60, 70, 78))
    // mode 4 Diagonal-Down-Right: diagonal (10+2·5+90+2)>>2 = 28;
    // above-diagonal taps through p[-1,-1], below through the left line
    assert(p4(4) === Seq(28, 11, 20, 30, 71, 28, 11, 20, 100, 71, 28, 11, 110, 100, 71, 28))
    // mode 5 Vertical-Right (zVR even/odd/-1/<-1 arms all exercised)
    assert(p4(5) === Seq(8, 15, 25, 35, 28, 11, 20, 30, 71, 8, 15, 25, 100, 28, 11, 20))
    // mode 6 Horizontal-Down (zHD even/odd/-1/<-1 arms all exercised)
    assert(p4(6) === Seq(48, 28, 11, 20, 95, 71, 48, 28, 105, 100, 95, 71, 115, 110, 105, 100))
    // mode 7 Vertical-Left (even/odd rows; reads into the top-right line)
    assert(p4(7) === Seq(15, 25, 35, 45, 20, 30, 40, 50, 25, 35, 45, 55, 30, 40, 50, 60))
    // mode 8 Horizontal-Up (half-pel, odd, zHU==5 and >5 saturation arms)
    assert(p4(8) === Seq(95, 100, 105, 110, 105, 110, 115, 118, 115, 118, 120, 120, 120, 120, 120, 120))

    // ---- 16x16 Plane (8.3.3.4) ----
    // top(x) = 50+3x, left(y) = 80+5y, tl = 40 (plane 32 wide, block at
    // (8,8)). Hand derivation: H = 6·Σk²(k=1..7) + 8·(95-40) = 840+440
    // = 1280; V = 10·Σk² + 8·(155-40) = 1400+920 = 2320;
    // a = 16·(155+95) = 4000; b = (5·1280+32)>>6 = 100;
    // c = (5·2320+32)>>6 = 181.
    val w2 = 32
    val plane2 = new Array[Int](w2 * 32)
    for (x <- 0 to 15) plane2(7 * w2 + 8 + x) = 50 + 3 * x
    for (y <- 0 to 15) plane2((8 + y) * w2 + 7) = 80 + 5 * y
    plane2(7 * w2 + 7) = 40
    val p16 = H264Cavlc.predict16x16(plane2, w2, 8, 8, 3,
      leftAvail = true, topAvail = true)
    def clip(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 to 15; x <- 0 to 15)
      assert(p16(y * 16 + x) ===
        clip((4000 + 100 * (x - 7) + 181 * (y - 7) + 16) >> 5),
        s"16x16 Plane diverges at ($x,$y)")
    // spot anchors of the hand arithmetic itself
    assert(p16(0) === 64 && p16(15) === 110 && p16(15 * 16) === 148 &&
      p16(255) === 195 && p16(7 * 16 + 7) === 125)

    // ---- chroma Plane (8.3.4.4: the 17-multiplier law) ----
    // top(x) = 30+4x, left(y) = 60+6y, tl = 20 (plane 16 wide, block at
    // (4,4)). H = (8+32+72) + 4·(58-20) = 264; V = (12+48+108) +
    // 4·(102-20) = 496; a = 16·(102+58) = 2560; b = (17·264+16)>>5 =
    // 140; c = (17·496+16)>>5 = 264.
    val plane3 = new Array[Int](w * 16)
    for (x <- 0 to 7) plane3(3 * w + 4 + x) = 30 + 4 * x
    for (y <- 0 to 7) plane3((4 + y) * w + 3) = 60 + 6 * y
    plane3(3 * w + 3) = 20
    val pc = H264Cavlc.predictChroma(plane3, w, 4, 4, 3,
      leftAvail = true, topAvail = true)
    for (y <- 0 to 7; x <- 0 to 7)
      assert(pc(y * 8 + x) ===
        clip((2560 + 140 * (x - 3) + 264 * (y - 3) + 16) >> 5),
        s"chroma Plane diverges at ($x,$y)")
    assert(pc(0) === 42 && pc(7) === 73 && pc(7 * 8) === 100 &&
      pc(63) === 131 && pc(3 * 8 + 3) === 80)
  }

  test("SPS frame cropping: decoded pictures crop per 7-24/7-25; the in-loop reference stays full-raster") {
    // ADVICE r14: pixel decode ignored the crop fields q_h264_meta honors.
    // Decode the same all-intra stream twice — once with the synth's
    // crop-0 SPS, once with the SAME bitstream under an SPS declaring
    // crop (the raster fields are identical, so the slice parses the
    // same) — and pin that the cropped output is exactly the crop window
    // of the full decode, luma AND both chroma planes.
    val s = H264Cavlc.synthCavlc(wMb = 3, hMb = 2, nFrames = 1, seed = 77L, rich = true)
    val nals = H264Codec.nalUnits(s.bytes).toVector
    val sps0 = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
    val pps = H264Codec.parsePpsFull(nals.collectFirst { case (8, n) => n }.get)
    val idr = nals.collectFirst { case (5, n) => n }.get
    val full = H264Cavlc.decodeISlice(idr, sps0, pps)
    assert(full.width === 48 && full.height === 32)
    val spsC = sps0.copy(cropL = 1, cropR = 2, cropT = 1, cropB = 3)
    val cropped = H264Cavlc.decodeISlice(idr, spsC, pps)
    // 7-24/7-25 with CropUnitX/Y = 2: luma drops 2·crop per edge
    assert(cropped.width === 48 - 2 * (1 + 2) && cropped.height === 32 - 2 * (1 + 3))
    for (y <- 0 until cropped.height; x <- 0 until cropped.width)
      assert(cropped.luma(y * cropped.width + x) ===
        full.luma((y + 2) * full.width + (x + 2)),
        s"luma crop window diverges at ($x,$y)")
    val (cw, ch) = (cropped.width / 2, cropped.height / 2)
    for (y <- 0 until ch; x <- 0 until cw) {
      assert(cropped.cb(y * cw + x) === full.cb((y + 1) * (full.width / 2) + (x + 1)))
      assert(cropped.cr(y * cw + x) === full.cr((y + 1) * (full.width / 2) + (x + 1)))
    }
    // crop that leaves no picture fails loud, not a negative allocation
    val e = intercept[IllegalArgumentException] {
      H264Cavlc.decodeISlice(idr, sps0.copy(cropL = 12, cropR = 12), pps)
    }
    assert(e.getMessage.contains("cropping"))
  }

  test("Table 9-4 inter cbp mapping is a permutation of 0..47 with cbp 0 on the shortest code") {
    assert(H264Cavlc.cbpInter.sorted.toSeq === (0 until 48))
    // P MBs most often carry no residual: codeNum 0 -> cbp 0; the next
    // spots go to chroma-DC-only (16) and single-8x8 patterns
    assert(H264Cavlc.cbpInter.take(4).toSeq === Seq(0, 16, 1, 2))
  }

  test("quarter-pel MC hand vectors: the 6-tap preserves a linear ramp, Table 8-12 averaging, edge clamping") {
    // 1-row reference: a pure ramp 0,10,20,... — the half-pel 6-tap
    // reproduces the midpoint exactly (it has unit DC gain and is
    // symmetric): b at G=20 is (0 - 50 + 400 + 600 - 200 + 50 + 16)>>5 = 25
    val ramp = Array.tabulate(8)(_ * 10)
    def mc(mvx: Int, mvy: Int, x0: Int = 2) =
      H264Cavlc.mcLuma(ramp, 8, 1, x0, 0, 1, 1, mvx, mvy)(0)
    assert(mc(0, 0) === 20)
    assert(mc(2, 0) === 25, "horizontal half-pel on a ramp")
    assert(mc(1, 0) === ((20 + 25 + 1) >> 1), "quarter = avg(int, half)")
    assert(mc(3, 0) === ((30 + 25 + 1) >> 1))
    // vertical on a transposed ramp (h=8, w=1)
    assert(H264Cavlc.mcLuma(ramp, 1, 8, 0, 2, 1, 1, 0, 2)(0) === 25)
    // edge clamping: mv far left of the frame reads the clamped column
    assert(mc(-160, 0, x0 = 0) === 0, "clamp to column 0")
    assert(mc(160, 0, x0 = 7) === 70, "clamp to the last column")
    // center position j on a bilinear field x+y: j(0.5, 0.5) = 1 exactly
    val bilin = Array.tabulate(64)(k => (k % 8) + (k / 8))
    assert(H264Cavlc.mcLuma(bilin, 8, 8, 3, 3, 1, 1, 2, 2)(0) === 7,
      "j at (3.5, 3.5) of the x+y field")
    // chroma eighth-pel bilinear: between 40 and 48 at fx=3: ((8-3)*40 + 3*48 + ... 1-row
    val cramp = Array.tabulate(8)(_ * 8)
    val c = H264Cavlc.mcChroma(cramp, 8, 1, 2, 0, 1, 1, 3, 0)
    // weights (8-fx)(8-fy), fy = 0: (5*8*16 + 3*8*24 + 32) >> 6 = 19
    assert(c(0) === ((5 * 8 * 16 + 3 * 8 * 24 + 32) >> 6), "eighth-pel bilinear")
  }

  test("mvp law unit cases: median, single-ref-match, B&C-unavailable collapse, 16x8/8x16 directional, skip rules") {
    import H264Codec.{Sps, Pps}
    val sps = Sps(66, 30, 4, 2, 4, 4, 0, 0, 0, 0)
    val pps = Pps(0, 0, cabac = false, 28, 0, deblockingControlPresent = true,
      constrainedIntraPred = false, redundantPicCntPresent = false)
    def fresh() = new H264Cavlc.PicState(sps, pps)
    // median of three distinct inter neighbors
    val st1 = fresh()
    H264Cavlc.assignMv(st1, 3, 4, 1, 1, 10, 2) // A (left of (4,4))
    H264Cavlc.assignMv(st1, 4, 3, 1, 1, 4, 8) // B (above)
    H264Cavlc.assignMv(st1, 5, 3, 1, 1, -6, 5) // C (above-right of 1-wide part)
    assert(H264Cavlc.mvPred(st1, 4, 4, 1, 0) === ((4, 5)), "component-wise median")
    // exactly one ref match (others intra) -> that neighbor verbatim
    val st2 = fresh()
    H264Cavlc.assignMv(st2, 3, 4, 1, 1, 10, 2)
    st2.blkKind(3 * st2.wb + 4) = 2 // B intra
    st2.blkKind(3 * st2.wb + 5) = 2 // C intra
    assert(H264Cavlc.mvPred(st2, 4, 4, 1, 0) === ((10, 2)), "single match wins")
    // B and C unavailable (frame edge), A available -> A (the collapse)
    val st3 = fresh()
    H264Cavlc.assignMv(st3, 0, 0, 1, 1, 7, -3)
    assert(H264Cavlc.mvPred(st3, 1, 0, 1, 0) === ((7, -3)), "top-row collapse to A")
    // 16x8 directional: top partition takes B verbatim when B matches
    val st4 = fresh()
    H264Cavlc.assignMv(st4, 4, 3, 4, 1, 9, 9) // B row above the partition
    H264Cavlc.assignMv(st4, 3, 4, 1, 1, 1, 1) // A would give a different answer
    assert(H264Cavlc.mvPred(st4, 4, 4, 4, 1) === ((9, 9)), "16x8 top takes B")
    assert(H264Cavlc.mvPred(st4, 4, 4, 4, 2) === ((1, 1)), "16x8 bottom takes A")
    // skip mv: zero when A is a zero-mv ref-0 block
    val st5 = fresh()
    H264Cavlc.assignMv(st5, 3, 4, 1, 4, 0, 0) // A zero-mv inter
    H264Cavlc.assignMv(st5, 4, 3, 4, 1, 6, 6) // B nonzero
    assert(H264Cavlc.skipMv(st5, 1, 1) === ((0, 0)), "zero-mv A forces skip mv 0")
    // skip mv: the 16x16 mvp when both neighbors are live nonzero inter
    val st6 = fresh()
    H264Cavlc.assignMv(st6, 3, 4, 1, 4, 6, 2) // A
    H264Cavlc.assignMv(st6, 4, 3, 4, 1, 6, 2) // B
    H264Cavlc.assignMv(st6, 8, 3, 1, 1, 6, 2) // C
    assert(H264Cavlc.skipMv(st6, 1, 1) === ((6, 2)), "skip inherits the 16x16 mvp")
  }

  test("inter oracle face: P frames are clamped block translations — closed form AND decoder == encoder") {
    for (seed <- 1L to 15L) {
      val (wMb, hMb) = (2 + (seed % 5).toInt, 1 + (seed % 3).toInt)
      val nFrames = 2 + (seed % 2).toInt // 1 IDR + 1..2 P
      val s = H264Cavlc.synthCavlcInter(seed, nFrames, wMb, hMb, rich = false)
      val dec = H264Cavlc.decodeBaselineStream(s.bytes)
      assert(dec.length === nFrames)
      val (wb, hb) = (wMb * 4, hMb * 4)
      // closed-form block values, frame by frame
      var prev: Array[Int] = null
      for (f <- 0 until nFrames) {
        val cur = new Array[Int](wb * hb)
        if (f == 0) {
          for (gx <- 0 until wb; gy <- 0 until hb) {
            var v = 128
            for (j <- 1 to gy) v += 4 * H264Cavlc.oracleLevel(seed, 0, gx, j)
            cur(gy * wb + gx) = v
          }
        } else {
          val (mvx, mvy) = H264Cavlc.oracleMv(seed, f)
          val (kx, ky) = (mvx / 16, mvy / 16)
          // H.264 mvs point INTO the reference: pred(x) = ref(x + mv)
          for (gx <- 0 until wb; gy <- 0 until hb)
            cur(gy * wb + gx) = prev(
              math.max(0, math.min(hb - 1, gy + ky)) * wb +
                math.max(0, math.min(wb - 1, gx + kx)))
        }
        // every pixel of the decoded frame equals its block's closed form
        val d = dec(f)
        for (py <- 0 until d.height; px <- 0 until d.width)
          assert(d.luma(py * d.width + px) === cur((py / 4) * wb + px / 4),
            s"seed $seed frame $f pixel ($px,$py)")
        assert(d.cb.forall(_ == 128) && d.cr.forall(_ == 128), s"seed $seed frame $f chroma")
        assert(d.luma.toSeq === s.frames(f).luma.toSeq, s"seed $seed frame $f recon")
        prev = cur
      }
    }
  }

  test("inter rich differential: skip runs, all P shapes, fractional mvs, residuals, intra-in-P, deblock laws") {
    for (seed <- 1L to 25L) {
      val (wMb, hMb) = (1 + (seed % 5).toInt, 1 + (seed % 3).toInt)
      val nFrames = 2 + (seed % 3).toInt
      val s = H264Cavlc.synthCavlcInter(seed, nFrames, wMb, hMb, rich = true)
      val dec = H264Cavlc.decodeBaselineStream(s.bytes)
      assert(dec.length === nFrames, s"seed $seed")
      for (f <- 0 until nFrames) {
        assert(dec(f).luma.toSeq === s.frames(f).luma.toSeq, s"seed $seed frame $f luma")
        assert(dec(f).cb.toSeq === s.frames(f).cb.toSeq, s"seed $seed frame $f cb")
        assert(dec(f).cr.toSeq === s.frames(f).cr.toSeq, s"seed $seed frame $f cr")
      }
    }
  }

  test("the inter law sweep exercises every P shape, every sub shape, skips, and intra-in-P") {
    var shapes = Set.empty[Int]
    var subs = Set.empty[Int]
    var rolls = Set.empty[String]
    for (seed <- 1L to 25L; f <- 1 until 4; mb <- 0 until 15) {
      val mh = H264Cavlc.mix(seed, f, mb, 2L)
      val roll = (H264Cavlc.mix(mh, 38L) % 10).toInt
      rolls += (if (roll < 2) "skip" else if (roll >= 8) "intra" else "inter")
      if (roll >= 2 && roll < 8) {
        val t = (H264Cavlc.mix(mh, 40L) % 4).toInt
        shapes += t
        if (t == 3) for (i <- 0 until 4) subs += (H264Cavlc.mix(mh, 41L, i) % 4).toInt
      }
    }
    assert(rolls === Set("skip", "inter", "intra"))
    assert(shapes === Set(0, 1, 2, 3), "P 16x16/16x8/8x16/8x8 all reached")
    assert(subs === Set(0, 1, 2, 3), "sub 8x8/8x4/4x8/4x4 all reached")
  }

  test("stream stats: MB-kind counts replay the law exactly; motion sums match the per-block field") {
    for (seed <- 1L to 10L) {
      val (wMb, hMb, nFrames) = (1 + (seed % 4).toInt, 1 + (seed % 3).toInt, 3)
      val s = H264Cavlc.synthCavlcInter(seed, nFrames, wMb, hMb, rich = true)
      val stats = new H264Cavlc.StreamStats
      H264Cavlc.decodeBaselineStream(s.bytes, stats)
      // replay the encoder's kind law independently
      val nMb = wMb * hMb
      var (eIntra, eInter, eSkip) = (nMb.toLong, 0L, 0L) // frame 0 is the IDR
      for (f <- 1 until nFrames; mb <- 0 until nMb) {
        val roll = (H264Cavlc.mix(H264Cavlc.mix(seed, f, mb, 2L), 38L) % 10).toInt
        if (roll < 2) eSkip += 1
        else if (roll >= 8) eIntra += 1
        else eInter += 1
      }
      assert((stats.nIntraMb, stats.nInterMb, stats.nSkipMb) ===
        ((eIntra, eInter, eSkip)), s"seed $seed MB kind counts")
      // the rich face's mv VALUES are pinned transitively: a wrong mv
      // breaks the pixel differential (MC reads it); the stats SCAN
      // itself is pinned exactly by the oracle face below
    }
    // the oracle face's closed form: explicit inter everywhere, mv law
    val seed = 4L
    val s = H264Cavlc.synthCavlcInter(seed, 3, 3, 2, rich = false)
    val stats = new H264Cavlc.StreamStats
    H264Cavlc.decodeBaselineStream(s.bytes, stats)
    val nMb = 6
    assert(stats.nIntraMb === nMb && stats.nSkipMb === 0
      && stats.nInterMb === nMb * 2L)
    val expSum = (1 to 2).map { f =>
      val (mvx, mvy) = H264Cavlc.oracleMv(seed, f)
      16L * nMb * (math.abs(mvx) + math.abs(mvy))
    }.sum
    assert(stats.sumAbsMv === expSum, "block motion field sums the mv law")
    val expMax = (1 to 2).map { f =>
      val (mvx, mvy) = H264Cavlc.oracleMv(seed, f)
      math.max(math.abs(mvx), math.abs(mvy))
    }.max
    assert(stats.maxAbsMv === expMax, "max |mv| component matches the law")
  }

  test("inter mutation fuzz: corrupt P-stream bytes fail loud (named require), never a raw crash or hang") {
    val rnd = new scala.util.Random(90001)
    val s = H264Cavlc.synthCavlcInter(7L, 3, 3, 2, rich = true)
    var named = 0
    for (_ <- 1 to 300) {
      val p = s.bytes.clone()
      for (_ <- 0 to rnd.nextInt(4))
        p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      try { H264Cavlc.decodeBaselineStream(p); () }
      catch {
        case _: IllegalArgumentException => named += 1
      }
    }
    assert(named > 0, "the sweep must hit at least some loud failures")
  }

  test("PPS guards fail loud by name: multi-reference defaults, weighted prediction") {
    // hand-built PPS RBSPs — the two fields the P parser assumes zero
    def ppsBytes(numRefMinus1: Int, weighted: Boolean): Array[Byte] = {
      val w = new H264Codec.BitWriter
      w.ue(0); w.ue(0); w.bit(0); w.bit(0); w.ue(0)
      w.ue(numRefMinus1); w.ue(0)
      w.bit(if (weighted) 1 else 0); w.bits(0, 2)
      w.se(0); w.se(0); w.se(0)
      w.bit(1); w.bit(0); w.bit(0)
      w.trailing()
      0x68.toByte +: w.toBytes
    }
    H264Codec.parsePpsFull(ppsBytes(0, weighted = false)) // sanity: legal form parses
    val e1 = intercept[IllegalArgumentException] {
      H264Codec.parsePpsFull(ppsBytes(1, weighted = false))
    }
    assert(e1.getMessage.contains("reference"))
    val e2 = intercept[IllegalArgumentException] {
      H264Codec.parsePpsFull(ppsBytes(0, weighted = true))
    }
    assert(e2.getMessage.contains("weighted"))
  }

  test("mutation fuzz: corrupt CAVLC slice bytes fail loud (named require), never a raw crash or hang") {
    val rnd = new scala.util.Random(52711)
    val s = H264Cavlc.synthCavlc(9L, 2, 3, 2, rich = true)
    val nals = H264Codec.nalUnits(s.bytes).toVector
    val sps = H264Codec.parseSps(nals.collectFirst { case (7, n) => n }.get)
    val pps = H264Codec.parsePpsFull(nals.collectFirst { case (8, n) => n }.get)
    val base = nals.collectFirst { case (5, n) => n }.get
    var named = 0
    for (_ <- 1 to 400) {
      val p = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      try { H264Cavlc.decodeISlice(p, sps, pps); () }
      catch {
        // require-discipline only; AIOOBE / negative-size / OOM propagate
        // and fail the test
        case _: IllegalArgumentException => named += 1
      }
    }
    assert(named > 0, "the sweep must hit at least some loud failures")
  }
}
