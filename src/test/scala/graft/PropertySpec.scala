package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 plan): ScalaCheck generators drive adversarial
  * inputs through every native-expression ≡ composed-form equality and the
  * fuzzy ladder. Table-driven, not per-case forAll: generating hundreds of
  * cases into ONE DataFrame keeps each property at one Spark job instead of
  * one job per sample. Fixed seed ⇒ reproducible failures.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic sample list from a generator (retry across seed steps
    * because Gen can discard).
    */
  private def samples[A](gen: Gen[A], n: Int): List[A] = {
    var seed = Seed(42L)
    val out = List.newBuilder[A]
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => out += a; i += 1 }
      seed = seed.next
    }
    out.result()
  }

  /** Adversarial text: mixes latin/cyrillic words, digits, punctuation runs,
    * exotic whitespace, repeats, and boundary lengths around the 5-char
    * shingle window.
    */
  private val textGen: Gen[String] = {
    val word = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)),
      Gen.oneOf("данные", "поток", "окно", "тест", "ёжик", "стримы"),
      Gen.numStr.map(_.take(6)),
      Gen.oneOf("a", "ab", "abc", "abcd", "abcde", "", "the", "and", "и", "в"),
      Gen.oneOf("!!!", "a.b,c", "x--y", "...", "co-op's"))
    val sep = Gen.oneOf(" ", "  ", "\t", " \n ", " ")
    for {
      k <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(k, word)
      ss <- Gen.listOfN(math.max(k - 1, 0), sep)
    } yield ws.zipAll(ss, "", "").map { case (w, s) => w + s }.mkString
  }

  test("property: shingle_hash60 ≡ composed on generated adversarial text") {
    GraftFunctions.register(spark)
    val df = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(col("id"),
        expr("shingle_hash60(text, 5)").as("native"),
        graft.ops.DedupOps.hashedShinglesComposed(col("text")).as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: ru_en_analyze ≡ composed analyzer on generated mixed text") {
    GraftFunctions.register(spark)
    val df = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(col("id"),
        graft.ops.SearchOps.analyze(col("text")).as("native"),
        graft.ops.SearchOps.analyzeComposed(col("text")).as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: md5_minhash ≡ composed shingle/md5/min on generated text") {
    GraftFunctions.register(spark)
    val df = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def mh(salt: String) =
      array_min(transform(
        array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5)))),
        s => md5(concat(lit(salt), s).cast("binary"))))
    val bad = df.select(col("id"),
        expr("md5_minhash(text)").as("native"),
        array(mh("s1"), mh("s2"), mh("s3"), mh("s4")).as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: gram_hash60 ≡ composed sliding grams on generated token arrays") {
    GraftFunctions.register(spark)
    val toksGen = Gen.chooseNum(0, 15).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "данные", "", "x1", "the")))
    val df = samples(toksGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    val bad = df.select(col("id"),
        expr("gram_hash60(toks, 8)").as("native"),
        graft.ops.TextOps.gramHash60Composed(col("toks"), 8).as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: gram_hash60_pos ≡ composed positional windows on generated token arrays") {
    GraftFunctions.register(spark)
    val win = (0 until 8).map(j => s"element_at(toks, i + $j)").mkString(", ")
    val composed = expr(
      s"""CASE WHEN size(toks) >= 8 THEN transform(sequence(1, size(toks) - 7),
         |  i -> cast(conv(substring(md5(concat_ws(' ', $win)), 1, 15), 16, 10) as bigint))
         |ELSE CAST(array() AS array<bigint>) END""".stripMargin)
    val toksGen = Gen.chooseNum(0, 15).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "данные", "", "x1", "the")))
    val df = samples(toksGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    val got = df.select(col("id"), expr("gram_hash60_pos(toks, 8)").as("native"),
        composed.as("ref"), size(col("toks")).as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"row ${r.getLong(0)}")
      // length law: exactly max(0, n-7) positional grams
      assert(r.getSeq[Long](1).size === math.max(0, r.getInt(3) - 7),
        s"row ${r.getLong(0)} length law")
    }
  }

  test("property: minhash_slots ≡ composed affine family on generated hash arrays") {
    GraftFunctions.register(spark)
    val hashesGen = Gen.chooseNum(1, 40).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0L, (1L << 60) - 1)))
    val df = samples(hashesGen, 300).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "hashes")
    val bad = df.select(col("id"),
        expr("minhash_slots(hashes, 8)").as("native"),
        graft.ops.DedupOps.fastSignature(col("hashes"), 8).as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: gram_stats ≡ composed gram aggregation on generated token arrays") {
    GraftFunctions.register(spark)
    val toksGen = Gen.chooseNum(0, 15).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "данные", "", "x1", "the")))
    val df = samples(toksGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "toks")
    val native = df.select(col("doc_id"), expr("gram_stats(toks)").as("gs"))
      .select(col("doc_id"),
        col("gs.n_bigrams").as("n_bigrams"), col("gs.top_bigram_n").as("top_bigram_n"),
        col("gs.n_trigrams").as("n_trigrams"), col("gs.dup_trigram_occ").as("dup_trigram_occ"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ref = graft.ops.TextOps.repetitionStatsComposed(df)
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        col("n_trigrams"), col("dup_trigram_occ"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(native.keySet === ref.keySet)
    val bad = native.collect { case (id, v) if ref(id) != v => (id, v, ref(id)) }
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: text_metrics ≡ composed six-regex struct on generated adversarial text") {
    GraftFunctions.register(spark)
    val df = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(col("id"),
        expr("text_metrics(text)").as("native"),
        graft.ops.TextOps.textMetricsComposed.as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: bpe_count ≡ composed regexp chain on generated adversarial text") {
    GraftFunctions.register(spark)
    val df = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(col("id"),
        expr("bpe_count(text)").as("native"),
        graft.ops.TextOps.tokenCountBpeComposed.as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging rows: ${bad.take(3).mkString("; ")}")
  }

  test("property: bpe_count bounds — never exceeds codepoints, never below piece count") {
    import graft.functions.BpeModel
    samples(textGen, 300).foreach { t =>
      val n = BpeModel.countTokens(t)
      val pieces = {
        val m = java.util.regex.Pattern.compile(BpeModel.PreTokPattern).matcher(t)
        var c = 0L; var cp = 0L
        while (m.find()) { c += 1; cp += m.group().codePointCount(0, m.group().length) }
        (c, cp)
      }
      assert(n >= pieces._1, s"'$t': $n < piece count ${pieces._1}")
      assert(n <= pieces._2, s"'$t': $n > codepoint total ${pieces._2}")
    }
  }

  test("property: exact-integer JLH score_fp matches a BigInt reference on random count tuples") {
    // the r11 centerpiece fix: score_fp = sign·(|2^20·(fg_df·bg_n −
    // bg_df·fg_n)·fg_df| div fg_n²·bg_df) computed in DECIMAL(38,0) must
    // equal arbitrary-precision truncated rational arithmetic for ANY
    // valid count tuple (fg_df ≤ fg_n ≤ bg_n, fg_df ≤ bg_df ≤ bg_n,
    // fg_df ≥ 1) — including boundary tuples (fg% = bg% ⇒ exactly 0,
    // all-foreground corpora, million-doc totals)
    val tupleGen = for {
      bgN <- Gen.chooseNum(1L, 2000000L)
      fgN <- Gen.chooseNum(1L, bgN)
      fgDf <- Gen.chooseNum(1L, fgN)
      bgDf <- Gen.chooseNum(fgDf, bgN)
    } yield (fgDf, bgDf, fgN, bgN)
    val rows = samples(tupleGen, 400) :+ ((2L, 2L, 2L, 10L)) :+ ((1L, 1L, 1L, 1L))
    // one synthetic postings/docs pair per tuple would cost 400 jobs; feed
    // the tuples straight through the same column arithmetic instead
    val df = rows.zipWithIndex
      .map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
      .toDF("id", "fg_df", "bg_df", "fg_n", "bg_n")
    // the SHARED production chain — the same code path sig-terms and
    // cluster-topics score through, not a test-local copy of it
    val got = graft.ops.SearchOps.withJlhScoreFp(df)
      .select(col("id"), col("score_fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.zipWithIndex.foreach { case ((fgDf, bgDf, fgN, bgN), i) =>
      val num = (BigInt(fgDf) * bgN - BigInt(bgDf) * fgN) * fgDf * 1048576L
      val den = BigInt(fgN) * fgN * bgDf
      val expect = (num.signum * (num.abs / den)).toLong
      assert(got(i.toLong) === expect,
        s"tuple (fg_df=$fgDf, bg_df=$bgDf, fg_n=$fgN, bg_n=$bgN)")
    }
  }

  test("property: autoFuzz ladder matches ES fuzziness:auto on generated tokens") {
    // pure function — per-sample checks are free, no Spark involved
    samples(Gen.alphaLowerStr.map(_.take(12)), 500).foreach { t =>
      val expected = if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
      assert(graft.ops.SearchOps.autoFuzz(t) === expected, s"token '$t'")
    }
  }

  /** Arbitrary small raster: random bytes, boundary dimensions (1-pixel
    * rows/cols, non-multiples of filters' bpp alignment).
    */
  private val imageGen: Gen[graft.ops.BmpCodec.Image] = for {
    w <- Gen.chooseNum(1, 21)
    h <- Gen.chooseNum(1, 17)
    bytes <- Gen.listOfN(w * h * 3, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield graft.ops.BmpCodec.Image(w, h, bytes.toArray)

  test("property: PNG encode∘decode is EXACT on arbitrary rasters (all five filters in play)") {
    samples(imageGen, 40).foreach { img =>
      val round = graft.ops.PngCodec.decode(graft.ops.PngCodec.encode(img))
      assert(round.width === img.width && round.height === img.height)
      assert(round.rgb.toSeq === img.rgb.toSeq,
        s"${img.width}x${img.height} raster did not round-trip")
    }
  }

  test("property: JPEG decode∘encode preserves dims and bounds error on arbitrary rasters") {
    samples(imageGen, 25).foreach { img =>
      val out = graft.ops.JpegCodec.decode(graft.ops.JpegCodec.encode(img))
      assert(out.width === img.width && out.height === img.height)
      var k = 0
      while (k < img.rgb.length) {
        val e = math.abs((img.rgb(k) & 0xff) - (out.rgb(k) & 0xff))
        assert(e <= 96, s"${img.width}x${img.height}: error $e at byte $k")
        k += 1
      }
    }
  }

  test("property: constant-color JPEG blocks are bit-exact under the DC law at any dims") {
    val gen = for {
      wb <- Gen.chooseNum(1, 4); hb <- Gen.chooseNum(1, 3)
      r <- Gen.chooseNum(0, 255); g <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
    } yield (wb, hb, r, g, b)
    samples(gen, 30).foreach { case (wb, hb, r, g, b) =>
      val w = wb * 8; val h = hb * 8
      val rgb = Array.tabulate(w * h * 3)(i => (i % 3 match {
        case 0 => r; case 1 => g; case _ => b
      }).toByte)
      val out = graft.ops.JpegCodec.decode(
        graft.ops.JpegCodec.encode(graft.ops.BmpCodec.Image(w, h, rgb)))
      def dc(ch: Int, q: Int): Int = {
        val a = 64 * (ch - 128)
        val dq = if (a >= 0) (a + 4 * q) / (8 * q) else -((-a + 4 * q) / (8 * q))
        math.min(255, math.max(0, 128 + ((dq * q + 4) >> 3)))
      }
      val y2 = dc(graft.ops.JpegCodec.rgbToY(r, g, b), 6)
      val cb2 = dc(graft.ops.JpegCodec.rgbToCb(r, g, b), 8)
      val cr2 = dc(graft.ops.JpegCodec.rgbToCr(r, g, b), 8)
      val exp = Seq(graft.ops.JpegCodec.yccToR(y2, cr2),
        graft.ops.JpegCodec.yccToG(y2, cb2, cr2),
        graft.ops.JpegCodec.yccToB(y2, cb2))
      out.rgb.zipWithIndex.foreach { case (v, i) =>
        assert((v & 0xff) === exp(i % 3), s"const ($r,$g,$b) ${w}x$h byte $i")
      }
    }
  }

  test("staged-exchange law: repartition-then-object-agg equals direct groupBy on adversarial keyed data") {
    // the r15 perf rewrites (denormNested, genre/person builders, the
    // CatalogDocs twins) all rest on one equivalence: inserting
    // repartition(key) between a frame and its groupBy(key).agg(collect_set)
    // changes ONLY the physical exchange placement, never the result.
    // Lock it on generated data with skewed keys, duplicate rows, nulls in
    // the collected column, and a mixed numeric aggregate riding along.
    val rows = samples(for {
      k <- Gen.chooseNum(0L, 6L)       // few keys -> heavy per-key skew
      v <- Gen.chooseNum(-50L, 50L)
      s <- Gen.oneOf("a", "b", null, "\u0000", "dup", "dup")
    } yield (k, v, s), 400)
    val df = rows.toDF("k", "v", "s")
    def agg(in: org.apache.spark.sql.DataFrame) =
      in.groupBy("k").agg(
        sort_array(collect_set(col("s"))).as("set"),
        count(lit(1)).as("n"),
        sum(col("v")).as("sv"))
    val direct = agg(df).orderBy("k").collect().map(_.toSeq.toList).toList
    val staged = agg(df.repartition(col("k"))).orderBy("k").collect()
      .map(_.toSeq.toList).toList
    assert(staged === direct)
  }
}
