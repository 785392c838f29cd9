package graft

import graft.functions.{GraftFunctions, MinHashSlots}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("operators self-register natives: a session missing the functions still resolves them") {
    // simulate a library consumer's vanilla session: same context, fresh
    // session state, graft functions force-dropped from its registry
    val vanilla = spark.newSession()
    val reg = vanilla.sessionState.functionRegistry
    Seq("minhash_slots", "simhash64", "md5_minhash", "ru_en_analyze",
        "lsh_sig", "vec_cosine", "ivf_assign", "gram_hash60", "shingle_hash60",
        "text_metrics", "gram_stats")
      .foreach(n => reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
    // cosineTopK needs vec_cosine; Tables.table must re-register on the way in
    val top = graft.ops.SimilarityOps.cosineTopK(vanilla, sf).collect()
    assert(top.nonEmpty && top.head.getAs[Long]("vec_id") === 0L)
  }

  private def composed(hashes: org.apache.spark.sql.Column, k: Int) =
    graft.ops.DedupOps.fastSignature(hashes, k)

  test("minhash_slots ≡ composed array_min(transform(affine-mod-p)) — bit-identical") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val df = (1 to 200).map(i => (i.toLong, Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong())))
      .toDF("id", "hashes")
    val both = df.select(col("id"),
        expr("minhash_slots(hashes, 8)").as("native"),
        composed(col("hashes"), 8).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
  }

  test("minhash_slots edge cases: empty array → null slots; null input → null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, None),
      (3L, Some(Seq(42L)))).toDF("id", "hashes")
    val out = df.select(col("id"), expr("minhash_slots(hashes, 4)").as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    assert(out(1L) === Seq(null, null, null, null)) // matches array_min(empty) = null
    assert(out(2L) === null)
    assert(out(3L).forall(_ != null))
  }

  test("minhash_slots agrees under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val df = (1 to 50).map(i => (i.toLong, Seq.fill(20)(i.toLong * 31 + 7))).toDF("id", "hashes")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(expr("minhash_slots(hashes, 8)")).collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("simhash64 ≡ composed 64-fold bit-vote form — bit-identical") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val df = (1 to 200).map(i => (i.toLong, Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong())))
      .toDF("id", "hashes")
    val both = df.select(col("id"),
        expr("simhash64(hashes)").as("native"),
        graft.ops.DedupOps.simhashComposed(col("hashes")).as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getLong(0)}"))
  }

  test("simhash64 agrees under interpreted and codegen paths; empty → 0") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Seq(5L, 9L, 5L)), (2L, Seq.empty[Long])).toDF("id", "hashes")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(expr("simhash64(hashes)")).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val a = run("CODEGEN_ONLY"); val b = run("NO_CODEGEN")
    assert(a === b)
    assert(a(1) === 0L)
  }

  test("md5_minhash ≡ composed shingle/md5/min pipeline on the real corpus") {
    val native = graft.ops.DedupOps.minhashSignature(spark, sf)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ref = graft.ops.DedupOps.minhashSignatureComposed(spark, sf)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(native.keySet === ref.keySet)
    native.foreach { case (id, sig) => assert(sig === ref(id), s"doc $id") }
  }

  test("md5_minhash edge cases match the composed form: empty, short, cyrillic, null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some("")),                 // empty: md5(salt) per slot
      (2L, Some("ab")),               // shorter than the shingle length
      (3L, Some("привет мир тест")),  // multi-byte codepoint slicing
      (4L, None),                     // null text → null
      (5L, Some("aaaaaaaaaa")))       // duplicate shingles: distinct-free min
      .toDF("doc_id", "text")
    def mh(salt: String) =
      array_min(transform(
        array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5)))),
        s => md5(concat(lit(salt), s).cast("binary"))))
    val rows = df.select(col("doc_id"),
        expr("md5_minhash(text)").as("native"),
        array(mh("s1"), mh("s2"), mh("s3"), mh("s4")).as("ref"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2) || r.getSeq[String](2).forall(_ == null))
      else assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
    // null input → null output specifically
    assert(rows.find(_.getLong(0) == 4L).get.isNullAt(1))
  }

  test("shingle_hash60 ≡ composed distinct-shingles/hash60 staging on the real corpus") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    val rows = d.select(col("doc_id"),
        expr("shingle_hash60(text, 5)").as("native"),
        graft.ops.DedupOps.hashedShinglesComposed(col("text")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}"))
  }

  test("shingle_hash60 edge cases match composed: empty, short, cyrillic, dup shingles, null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some("")),                 // empty: one empty shingle
      (2L, Some("ab")),               // shorter than k: one clipped shingle
      (3L, Some("привет мир тест")),  // multi-byte codepoint slicing
      (4L, None),                     // null text → null
      (5L, Some("aaaaaaaaaa")))       // heavy duplicates: distinct-by-string
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        expr("shingle_hash60(text, 5)").as("native"),
        graft.ops.DedupOps.hashedShinglesComposed(col("text")).as("ref"))
      .collect()
    rows.foreach { r =>
      // null text: native → null; composed → [null] (greatest() skips the
      // null length) — same accepted divergence as md5_minhash's null case
      if (r.isNullAt(1))
        assert(r.isNullAt(2) || r.getSeq[java.lang.Long](2).forall(_ == null))
      else assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 4L).get.isNullAt(1))
    // "aaaaaaaaaa" has exactly one distinct 5-shingle
    assert(rows.find(_.getLong(0) == 5L).get.getSeq[Long](1).length === 1)
  }

  test("text_metrics ≡ composed six-regex struct on the real corpus") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    val bad = d.select(col("doc_id"),
        expr("text_metrics(text)").as("native"),
        graft.ops.TextOps.textMetricsComposed.as("ref"))
      .filter(not(col("native") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"diverging docs: ${bad.take(3).mkString("; ")}")
  }

  test("text_metrics edge cases: empty, ws-only, cjk, digits-in-words, underscores, null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some("")),
      (2L, Some("   \t  ")),
      (3L, Some("the 中文 test 中")),          // cjk chars count as punct AND cjk
      (4L, Some("the1 the _the the_ THE tHe")), // \b run semantics + case folding
      (5L, Some("ab12cd34 1a2b !!x__y!!")),     // bpe alpha/digit runs vs \b runs
      (6L, Some("a-the,of.is to")),             // punctuation boundaries
      (7L, None))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        expr("text_metrics(text)").as("native"),
        graft.ops.TextOps.textMetricsComposed.as("ref"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.getLong(0) === 7L)
      else assert(r.getStruct(1).toSeq === r.getStruct(2).toSeq, s"doc ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 7L).get.isNullAt(1))
  }

  test("text_metrics Kelvin-sign divergence is pinned: ASCII word model, not Unicode lower()") {
    GraftFunctions.register(spark)
    // U+212A KELVIN SIGN: Unicode-lowercases to 'k', so the composed form's
    // lower(text) sees the word "kis" while the native ASCII word model
    // sees a punct char + the word "is" (stop/en hit). This is the accepted
    // divergence documented on TextMetrics — pin the NATIVE values so any
    // accidental behavior change trips here, not in a correctness run.
    val kelvin = "\u212Ais" // "Kis" with a Kelvin K (U+212A)
    val r = Seq(kelvin).toDF("text")
      .select(expr("text_metrics(text)").as("m"))
      .head.getStruct(0)
    assert(r.getAs[Int]("n_chars") === 3)
    assert(r.getAs[Int]("n_tokens") === 1)
    assert(r.getAs[Int]("bpe_tokens") === 2) // Kelvin single + "is" run
    assert(r.getAs[Int]("punct") === 1)      // Kelvin is non-ASCII-alnum
    assert(r.getAs[Int]("stop_hits") === 1)  // standalone run "is"
    assert(r.getAs[Int]("en_hits") === 1)
    // and the composed form indeed disagrees — the divergence is real, not
    // a stale comment (if Spark's lower() ever stops folding U+212A, this
    // guard will say so)
    val composed = Seq(kelvin).toDF("text")
      .select(graft.ops.TextOps.textMetricsComposed.as("m"))
      .head.getStruct(0)
    assert(composed.getAs[Int]("en_hits") === 0)
    assert(composed.getAs[Int]("stop_hits") === 0)
  }

  test("gram_stats ≡ composed explode/double-groupBy/join aggregation on the real corpus") {
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val native = toks.select(col("doc_id"), expr("gram_stats(toks)").as("gs"))
      .select(col("doc_id"),
        col("gs.n_bigrams").as("n_bigrams"), col("gs.top_bigram_n").as("top_bigram_n"),
        col("gs.n_trigrams").as("n_trigrams"), col("gs.dup_trigram_occ").as("dup_trigram_occ"))
    val ref = graft.ops.TextOps.repetitionStatsComposed(toks)
      .select(col("doc_id"),
        col("n_bigrams").as("rb"), col("top_bigram_n").as("rt"),
        col("n_trigrams").as("rn"), col("dup_trigram_occ").as("rd"))
    val joined = native.join(ref, Seq("doc_id")).collect()
    assert(joined.length.toLong === toks.count())
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") === r.getAs[Long]("rb"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("top_bigram_n") === r.getAs[Long]("rt"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("n_trigrams") === r.getAs[Long]("rn"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("dup_trigram_occ") === r.getAs[Long]("rd"), s"doc ${r.getLong(0)}")
    }
  }

  test("bpe_count ≡ composed regexp-replace-chain on the real corpus") {
    GraftFunctions.register(spark)
    val joined = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("bpe_count(text)").as("native"),
        graft.ops.TextOps.tokenCountBpeComposed.as("composed"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getAs[Long]("native") === r.getAs[Long]("composed"),
      s"doc ${r.getLong(0)}"))
  }

  test("bpe_count: hand-checked merges, case sensitivity, digits/punct, empty, null") {
    GraftFunctions.register(spark)
    import graft.functions.BpeModel
    // fixture merges: t+h→th, th+e→the; a+t→at, th+at→that; s+t→st,
    // st+r→str, i+n→in, in+g→ing
    assert(BpeModel.countTokens("the") === 1L)
    assert(BpeModel.countTokens("that") === 1L)
    assert(BpeModel.countTokens("string") === 2L)    // str + ing
    assert(BpeModel.countTokens("The") === 3L)       // case-sensitive: T h e
    assert(BpeModel.countTokens("12345") === 5L)     // digits never merge
    assert(BpeModel.countTokens("a,b") === 3L)       // a , b
    assert(BpeModel.countTokens("the cat sat") === 1L + 2L + 2L) // c+at, s+at
    assert(BpeModel.countTokens("") === 0L)
    assert(BpeModel.countTokens("   ") === 0L)
    val out = Seq((1L, Option.empty[String]), (2L, Some("the")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), expr("bpe_count(text)").as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) === -1L) // null in → null out
    assert(out(2L) === 1L)
  }

  test("bpeTrainMerges: learns the dominant pairs from a planted corpus, valid by construction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-train").toString
    // "thin thin" breaks the (t,h)-vs-(h,e) pair-count tie that a pure
    // "the" corpus has (every (t,h) would co-occur with an (h,e))
    Seq((1L, "the the the the then thin thin"), (2L, "the them there other"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val learned = graft.ops.TextOps.bpeTrainMerges(spark, dir, nMerges = 4)
    // 'th' and 'the' dominate every word: the first two merges must form them
    assert(learned.take(2) === Vector("t" -> "h", "th" -> "e"))
    graft.functions.BpeModel.requireValid(learned) // trained tables are valid
    // a trained table drives the same counting mechanics
    assert(graft.functions.BpeModel.countTokens("the", learned) === 1L)
  }

  test("gram_stats edge cases: empty array, 1-2 tokens, null elements, null input") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq[Option[String]]())),                       // empty: one "" gram each
      (2L, Some(Seq(Option("solo")))),                         // truncated bi+tri gram
      (3L, Some(Seq(Option("a"), Option("b")))),               // one real bigram
      (4L, Some(Seq(Option("a"), None, Option("a")))),         // concat_ws null-drop
      (5L, Some(Seq(Option("x"), Option("y"), Option("x"), Option("y"), Option("x")))),
      (6L, None))                                              // null input → null
      .toDF("doc_id", "toks")
    val out = df.select(col("doc_id"), expr("gram_stats(toks)").as("gs")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(out(6L) === null)
    assert(out(1L).toSeq === Seq(1L, 1L, 1L, 0L))
    assert(out(2L).toSeq === Seq(1L, 1L, 1L, 0L))
    assert(out(3L).toSeq === Seq(1L, 1L, 1L, 0L))
    // doc 4: bigrams ("a", "a") — both null-dropped to "a" → top=2;
    // trigram window is "a a" once → no dup
    assert(out(4L).toSeq === Seq(2L, 2L, 1L, 0L))
    // doc 5: bigrams x y, y x, x y, y x → top 2 of 4; trigrams x y x (×2), y x y → dup 2 of 3
    assert(out(5L).toSeq === Seq(4L, 2L, 3L, 2L))
    // and the same frame agrees with the composed aggregation wherever it's defined
    val toks = df.filter(col("toks").isNotNull)
    val ref = graft.ops.TextOps.repetitionStatsComposed(toks)
      .collect().map(r => r.getLong(0) ->
        Seq(r.getAs[Long]("n_bigrams"), r.getAs[Long]("top_bigram_n"),
            r.getAs[Long]("n_trigrams"), r.getAs[Long]("dup_trigram_occ"))).toMap
    ref.foreach { case (id, counters) => assert(out(id).toSeq === counters, s"doc $id") }
  }

  test("ru_en_analyze ≡ composed analyzer pipeline on the real corpus") {
    GraftFunctions.register(spark)
    val both = Tables.documents(spark, sf).select(col("doc_id"),
        expr("ru_en_analyze(text)").as("native"),
        graft.ops.SearchOps.analyzeComposed(col("text")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("ru_en_analyze edge cases match composed: possessives, ё, stopwords, empty, null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some("The cat's toys are 'quoted' and the dogs run")), // possessive+plural+stops+quotes
      (2L, Some("Актёр играет роли в фильмах")),                  // ё + ru stems + ru stopword
      (3L, Some("")),                                             // empty → empty array
      (4L, None),                                                 // null → null
      (5L, Some("'''")),                                          // quotes only → empty
      (6L, Some("Data2024 mixed-случай x")))                      // digits + mixed scripts
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        expr("ru_en_analyze(text)").as("native"),
        graft.ops.SearchOps.analyzeComposed(col("text")).as("ref"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 4L).get.isNullAt(1))
  }

  test("lsh_sig ≡ composed per-plane aggregate/zip_with form — bit-identical on real vectors") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    for (nPlanes <- Seq(12, 24)) {
      val rows = emb.select(col("vec_id"),
          graft.ops.SimilarityOps.lshSignature(col("v"), nPlanes).as("native"),
          graft.ops.SimilarityOps.lshSignatureComposed(col("v"), nPlanes).as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"vec ${r.getLong(0)} nPlanes=$nPlanes"))
    }
  }

  test("lsh_sig edge cases: malformed vector → 0; null input → 0 (composed when/otherwise parity)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq.fill(64)(0.5))),          // well-formed
      (2L, Some(Seq(1.0, 2.0))),              // wrong length → composed dots null → 0
      (3L, Some(Seq.empty[Double])),          // empty → 0
      (4L, None))                              // null input → otherwise(0) → 0
      .toDF("id", "v")
    val rows = df.select(col("id"),
        expr("lsh_sig(v, 12)").as("native"),
        graft.ops.SimilarityOps.lshSignatureComposed(col("v"), 12).as("ref"))
      .collect().sortBy(_.getLong(0))
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getLong(0)}"))
    assert(rows(0).getLong(1) !== 0L)
    assert(rows(1).getLong(1) === 0L)
    assert(rows(2).getLong(1) === 0L)
    assert(rows(3).getLong(1) === 0L)
  }

  test("vec_cosine ≡ composed dot/(norm·norm) — bit-identical on real vector pairs") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    val rows = emb.crossJoin(broadcast(q)).select(col("vec_id"),
        graft.ops.SimilarityOps.cosine(col("v"), col("qv")).as("native"),
        graft.ops.SimilarityOps.cosineComposed(col("v"), col("qv")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // bit-compare doubles (also handles a hypothetical NaN identically)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec ${r.getLong(0)}")
    }
  }

  test("vec_sanity ≡ composed aggregate/exists pair — bit-identical on the real corpus and hostile vectors") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nan = Double.NaN; val pinf = Double.PositiveInfinity
    val hostile = Seq(
      (9001L, Seq(1.0, nan, 3.0)),               // NaN component
      (9002L, Seq(pinf, 1.0)),                   // +Inf
      (9003L, Seq(-pinf, 0.5)),                  // -Inf
      (9004L, Seq.empty[Double]),                // empty → norm 0, no flag
      (9005L, Seq(0.0, 0.0)),                    // exact zero norm
      (9006L, Seq(1.0e200, 1.0)),                // per-component cap hits
      (9007L, Seq(0.7071067811865476)),          // rounding midpoint region
      (9008L, Seq(1.0e-10))                      // rounds to 0 at 2^20 grain
    ).toDF("vec_id", "v")
    for (df <- Seq(emb, hostile)) {
      val (normRef, nanRef) = graft.ops.SimilarityOps.sanityComposed(col("v"))
      val rows = df.select(col("vec_id"),
          expr("vec_sanity(v)").as("s"), normRef.as("n_ref"), nanRef.as("h_ref"))
        .select(col("vec_id"), col("s.norm2_fp"), col("s.has_nan"),
          col("n_ref"), col("h_ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) === r.getLong(3), s"norm2_fp vec ${r.getLong(0)}")
        assert(r.getBoolean(2) === r.getBoolean(4), s"has_nan vec ${r.getLong(0)}")
      }
    }
    // NULL vector and null element propagate like the composed HOFs — and
    // they must do so through WHOLE-STAGE CODEGEN, not just interpreted
    // eval: a local relation gets constant-folded, so round-trip the rows
    // through parquet to force the generated path (this is the shape that
    // caught the missing isNull propagation in the r13 review)
    val tmpDir = java.nio.file.Files.createTempDirectory("vecsan")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val tmp = tmpDir.toString + "/n.parquet"
    Seq((1L, Option.empty[Seq[java.lang.Double]]),
        (2L, Some(Seq[java.lang.Double](1.0, null))),
        (3L, Some(Seq[java.lang.Double](1.0, 2.0))))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .select(col("vec_id"), expr("vec_sanity(v)").as("s"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(back(1L).isNullAt(1), "NULL vector must yield NULL under codegen")
    assert(back(2L).isNullAt(1), "null element must yield NULL under codegen")
    assert(!back(3L).isNullAt(1), "clean vector must stay non-null under codegen")
    // NON-NULLABLE child (CreateArray): without the nullable=true override
    // the optimizer constant-folds isnull() to false and codegen's
    // non-nullable branch emits an assignment to an undeclared isNull var
    val tmp2 = tmpDir.toString + "/nn.parquet"
    Seq((1L, Some(1.0): Option[Double], Some(2.0): Option[Double]),
        (2L, Some(1.0), Option.empty[Double]))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(tmp2)
    val nn = spark.read.parquet(tmp2)
      .select(col("id"), expr("vec_sanity(array(a, b))").as("s"))
    val nnRows = nn.collect().map(r => r.getLong(0) -> r).toMap
    assert(!nnRows(1L).isNullAt(1), "clean non-nullable-child row stays non-null")
    assert(nnRows(2L).isNullAt(1),
      "null element under a NON-NULLABLE child must still yield NULL")
    assert(nn.filter(expr("vec_sanity(array(a, b)) IS NULL")).count() === 1L,
      "isnull over the non-nullable child must not constant-fold away")
  }

  test("cosDriver ≡ vec_cosine — the driver-side probe ranking replays the plan bit-for-bit") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    val qv = emb.filter(col("vec_id") === 0L).select(col("v"))
      .collect().head.getSeq[Double](0).toArray
    val rows = emb.select(col("vec_id"), col("v"),
        graft.ops.SimilarityOps.cosine(col("v"),
          array(qv.map(lit(_)): _*)).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val driver = graft.ops.SimilarityOps.cosDriver(r.getSeq[Double](1).toArray, qv)
      assert(java.lang.Double.doubleToLongBits(driver) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec ${r.getLong(0)}")
    }
    // and the full probe-cell ranking agrees with the in-plan
    // sort_array(cellScores, desc) ordering it replaced, at every nprobe
    val codebook = graft.ops.SimilarityOps.collectCodebook(emb, 16)
    val planRank = emb.filter(col("vec_id") === 0L)
      .select(explode(sort_array(
        graft.ops.SimilarityOps.cellScores(col("v"), codebook), asc = false)).as("pc"))
      .select(col("pc.cid")).collect().map(_.getInt(0)).toSeq
    for (nprobe <- Seq(1, 2, 4, 16))
      assert(graft.ops.SimilarityOps.rankProbeCells(qv, codebook, nprobe) ===
        planRank.take(nprobe), s"nprobe=$nprobe")
  }

  test("vec_cosine edge cases: length mismatch / null element → null; zero vector → NaN") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // mismatch → null
      (2L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 1.0))),      // zero vec → 0/0 = NaN
      (3L, None, Some(Seq(1.0))),                          // null input → null
      (4L, Some(Seq(3.0, 4.0)), Some(Seq(3.0, 4.0))))      // plain → 1.0
      .toDF("id", "a", "b")
    val out = df.select(col("id"), expr("vec_cosine(a, b)").as("c")).collect()
      .sortBy(_.getLong(0))
    assert(out(0).isNullAt(1))
    assert(out(1).getDouble(1).isNaN) // documented divergence: ANSI Divide raises here
    assert(out(2).isNullAt(1))
    assert(math.abs(out(3).getDouble(1) - 1.0) < 1e-12)
    // composed parity on the rows where composed is defined (ANSI mode turns
    // the zero-norm division into DIVIDE_BY_ZERO, so row 2 is native-only)
    val ref = df.filter(col("id") =!= 2L)
      .select(col("id"), expr("vec_cosine(a, b)").as("c"),
        graft.ops.SimilarityOps.cosineComposed(col("a"), col("b")).as("ref"))
      .collect().sortBy(_.getLong(0))
    ref.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getDouble(1) === r.getDouble(2))
    }
  }

  test("lsh_sig / vec_cosine agree under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("qv", expr("v")) // self-cosine ⇒ deterministic 1.0-ish values
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try emb.select(expr("lsh_sig(v, 24)"), expr("vec_cosine(v, qv)"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("ivf_assign ≡ composed array_max(struct(sim,cid)).cid — including tie/NaN ordering") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.typedlit
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    val codebook = graft.ops.SimilarityOps.collectCodebook(emb, 16)
    val composedRef = array_max(array(codebook.map { case (cid, cv) =>
      struct(graft.ops.SimilarityOps.cosineComposed(col("v"), typedlit(cv.toSeq)).as("sim"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")
    val cbLit = typedlit(codebook.map(_._2.toSeq).toSeq)
    val rows = emb.select(col("vec_id"),
        call_function("ivf_assign", col("v"), cbLit).as("native"),
        composedRef.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) === r.getInt(2), s"vec ${r.getLong(0)}"))
    // malformed vector: every composed sim NULL ⇒ tie on cid ⇒ last cell
    val edge = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
      .select(call_function("ivf_assign", col("v"), cbLit)).collect()
    assert(edge.head.getInt(0) === 15)
  }

  test("gram_hash60 ≡ composed sliding-window hash60 grams — bit-identical incl. order") {
    GraftFunctions.register(spark)
    val real = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val edge = Seq(
      (90001L, Seq("one")),                         // shorter than n → 1 partial gram
      (90002L, Seq.fill(8)("tok")),                  // exactly n
      (90003L, (1 to 9).map(i => s"t$i")),           // n+1 → 2 grams
      (90004L, Seq("")),                             // split("") shape
      (90005L, Seq("a", "b", "a", "b", "a", "b", "a", "b", "a", "b"))) // duplicate grams
      .toDF("doc_id", "toks")
    for (df <- Seq(real, edge)) {
      val rows = df.select(col("doc_id"),
          expr("gram_hash60(toks, 8)").as("native"),
          graft.ops.TextOps.gramHash60Composed(col("toks"), 8).as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}"))
    }
    // null input → null, matching the composed transform-over-null
    val nulls = Seq((1L, Option.empty[Seq[String]])).toDF("doc_id", "toks")
      .select(expr("gram_hash60(toks, 8)").as("g")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("gram_hash60_pos ≡ composed positional window hashes — duplicates kept, no tail gram") {
    GraftFunctions.register(spark)
    val win = (0 until 8).map(j => s"element_at(toks, i + $j)").mkString(", ")
    val composed = expr(
      s"""CASE WHEN size(toks) >= 8 THEN transform(sequence(1, size(toks) - 7),
         |  i -> cast(conv(substring(md5(concat_ws(' ', $win)), 1, 15), 16, 10) as bigint))
         |ELSE CAST(array() AS array<bigint>) END""".stripMargin)
    val real = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0).as("toks"))
    val edge = Seq(
      (90001L, Seq("one")),                          // shorter than n → EMPTY (no partial gram)
      (90002L, Seq.fill(8)("tok")),                  // exactly n → 1 gram
      (90003L, (1 to 10).map(i => s"t$i")),          // n+2 → 3 grams, position order
      (90005L, Seq.fill(12)("x")))                   // duplicate windows all kept
      .toDF("doc_id", "toks")
    for (df <- Seq(real, edge)) {
      val rows = df.select(col("doc_id"),
          expr("gram_hash60_pos(toks, 8)").as("native"),
          composed.as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}"))
    }
    // duplicates kept: 12 identical tokens → 5 identical hashes
    val dup = Seq((1L, Seq.fill(12)("x"))).toDF("doc_id", "toks")
      .select(expr("gram_hash60_pos(toks, 8)")).collect()
    assert(dup.head.getSeq[Long](0).size === 5)
    assert(dup.head.getSeq[Long](0).distinct.size === 1)
    val nulls = Seq((1L, Option.empty[Seq[String]])).toDF("doc_id", "toks")
      .select(expr("gram_hash60_pos(toks, 8)").as("g")).collect()
    assert(nulls.head.isNullAt(0))
  }

  /** Composed built-ins form of gram_buckets: filter empties, n-windows
    * joined by single spaces (empty when fewer than n tokens), hash60 via
    * md5-prefix conv, optional mod. This IS the specification the native
    * expression must match.
    */
  private def gramBucketsComposed(n: Int, m: Long): org.apache.spark.sql.Column = {
    val win = (0 until n).map(j => s"element_at(ft, i + $j)").mkString(", ")
    val hash = s"cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)"
    expr(
      s"""transform(
         |  CASE WHEN size(ft) < $n THEN array()
         |       ELSE transform(sequence(1, size(ft) - ${n - 1}),
         |                      i -> concat_ws(' ', $win)) END,
         |  g -> ${if (m > 0) s"$hash % $m" else hash})""".stripMargin)
  }

  test("gram_buckets ≡ composed filter→window→hash60[→mod] — bit-identical incl. order") {
    GraftFunctions.register(spark)
    val real = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val edge = Seq(
      (90001L, Seq("one")),                         // fewer than n=2 → empty bigrams
      (90002L, Seq("a", "b")),                       // exactly one bigram
      (90003L, Seq("", "a", "", "b", "")),           // empties filtered BEFORE windowing
      (90004L, Seq("")),                             // split("") shape → zero grams
      (90005L, Seq("a", "b", "a", "b", "a")))        // repeated grams stay per-occurrence
      .toDF("doc_id", "toks")
    for (df <- Seq(real, edge); (n, m) <- Seq((1, 4096L), (2, 4096L), (2, 0L))) {
      val rows = df.withColumn("ft", expr("filter(toks, t -> length(t) > 0)"))
        .select(col("doc_id"),
          expr(s"gram_buckets(toks, $n, $m)").as("native"),
          gramBucketsComposed(n, m).as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)} n=$n m=$m"))
    }
    val nulls = Seq((1L, Option.empty[Seq[String]])).toDF("doc_id", "toks")
      .select(expr("gram_buckets(toks, 2, 4096)").as("g")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("gram_buckets agrees under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, sf)
      .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(expr("gram_buckets(toks, 2, 4096)")).collect()
        .map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("gram_hash60 agrees under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, sf)
      .select(split(lower(trim(col("text"))), "\\s+").as("toks"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(expr("gram_hash60(toks, 8)")).collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("phrase_count ≡ composed slice/filter HOF form on the real corpus") {
    GraftFunctions.register(spark)
    val ph = Seq("data", "stream")
    val n = ph.length
    val df = graft.Tables.documents(spark, sf)
      .select(graft.ops.SearchOps.analyze(col("text")).as("toks"))
    val native = df.select(expr(s"phrase_count(toks, array('data','stream'))"))
      .collect().map(_.getLong(0)).toSeq
    val comp = df.select(
        when(size(col("toks")) >= n,
          size(filter(sequence(lit(1), size(col("toks")) - n + 1),
            i => slice(col("toks"), i, lit(n)) === typedlit(ph))))
          .otherwise(lit(0)).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(native === comp)
    assert(native.sum > 0, "corpus must contain the phrase somewhere")
  }

  test("phrase_count edge cases: overlap, null token windows, short array, null input") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq("a", "a", "a")),          // overlapping 'a a' ⇒ 2
      (2L, Seq("a", null, "a")),         // null inside every window ⇒ 0
      (3L, Seq("a")),                    // shorter than the phrase ⇒ 0
      (4L, Seq.empty[String]),           // empty ⇒ 0
      (5L, null)                         // null input ⇒ null
    ).toDF("id", "toks")
    val got = df.select(col("id"), expr("phrase_count(toks, array('a','a'))").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> null))
  }

  test("phrase_count agrees under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, sf)
      .select(graft.ops.SearchOps.analyze(col("text")).as("toks"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(expr("phrase_count(toks, array('data','stream'))"))
        .collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("winnow_select ≡ composed slice/reverse/array_min form — bit-identical, real corpus + adversarial ties") {
    GraftFunctions.register(spark)
    // random arrays from a SMALL value domain so window-min ties (the
    // rightmost-tie rule's whole reason to exist) occur constantly
    val rnd = new scala.util.Random(13)
    val synth = (1 to 300).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextInt(5).toLong)))
      .toDF("doc_id", "gs")
    // the real corpus hash stream, THROUGH PARQUET so whole-stage codegen
    // is actually exercised (local relations constant-fold to interpreted)
    val p = "/tmp/graft_fn_winnow"
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("gram_hash60_pos(filter(split(lower(trim(text)), '\\\\s+'), t -> length(t) > 0), 4)").as("gs"))
      .write.mode("overwrite").parquet(p)
    for ((df, w) <- Seq((synth, 4), (synth, 1), (synth, 7),
                        (spark.read.parquet(p), 4))) {
      val both = df.select(col("doc_id"),
          expr(s"winnow_select(gs, $w)").as("native"),
          graft.ops.DedupOps.winnowSelectComposed(w).as("ref"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"w=$w doc ${r.getLong(0)}")
      }
    }
  }

  test("winnow_select edge cases + interpreted/codegen agreement") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq.empty[Long])),           // empty → empty selection
      (2L, None),                            // null input → null
      (3L, Some(Seq(9L))),                   // shorter than one window
      (4L, Some(Seq(5L, 3L, 3L, 3L, 8L))),   // tie run: rightmost wins
      (5L, Some(Seq(2L, 2L, 2L, 2L, 2L, 2L)))) // all-equal: one per slide
      .toDF("doc_id", "gs")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("doc_id"), expr("winnow_select(gs, 4)").as("s"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1).toSeq))
        .toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val out = run("CODEGEN_ONLY")
    assert(out === run("NO_CODEGEN"))
    assert(out(1L) === Seq())
    assert(out(2L) === null)
    assert(out(3L) === Seq(1L))
    // windows of [5,3,3,3,8]: [5333]→pos4, [3338]→rightmost 3 at pos 4
    assert(out(4L) === Seq(4L))
    // all-equal: every window selects its own last element
    assert(out(5L) === Seq(4L, 5L, 6L))
  }

  test("minhash_slots survives dup detection end-to-end (same text ⇒ same sig)") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "identical shingle text"), (2L, "identical shingle text"),
                 (3L, "something entirely different here"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_fn_docs/documents.parquet")
    val pairs = graft.ops.DedupOps.minhashPairs(spark, "/tmp/graft_fn_docs").collect()
    assert(pairs.exists(r => r.getAs[Long]("left_id") == 1L &&
      r.getAs[Long]("right_id") == 2L && r.getAs[Double]("est_jaccard") == 1.0))
  }

  test("distinct_sorted_concat: bit-equal to concat_ws(sort_array(collect_set)) + size, through real exchanges") {
    // the repo's first custom AGGREGATE: one imperative UTF8String buffer
    // replacing the three-op composed form on the dim-doc faces. Equality
    // must hold through BOTH physical paths: partial-on-scan + serialized
    // buffers over the exchange + final merge (no pre-repartition), and
    // the staged-exchange shape (repartition first, partial+final fused).
    import spark.implicits._
    GraftFunctions.register(spark)
    def composed(in: org.apache.spark.sql.DataFrame) =
      in.groupBy("k").agg(
        concat_ws(";", sort_array(collect_set(col("s")))).as("joined"),
        size(sort_array(collect_set(col("s")))).as("n"))
        .orderBy("k").collect().map(_.toSeq.toList).toList
    def native(in: org.apache.spark.sql.DataFrame) =
      in.groupBy("k").agg(expr("distinct_sorted_concat(s, ';')").as("j"))
        .select(col("k"), col("j.joined").as("joined"), col("j.n").as("n"))
        .orderBy("k").collect().map(_.toSeq.toList).toList

    // adversarial rows: unicode, empty string, separator-bearing values,
    // duplicates, null (skipped like collect_set), a key with ONLY nulls
    val rows = Seq(
      (1L, "b"), (1L, "a"), (1L, "a"), (1L, ""), (1L, "x;y"), (1L, null),
      (2L, "\u0434\u0430"), (2L, "z"), (2L, "\u00e9"), (3L, null),
      (4L, "solo")) ++ (0 until 500).map(i => (5L, s"v${i % 37}"))
    // parquet round trip + 8 partitions: real unsafe rows, real exchange
    val dir = java.nio.file.Files.createTempDirectory("dsc").toString + "/t"
    rows.toDF("k", "s").repartition(8).write.parquet(dir)
    val df = spark.read.parquet(dir)
    assert(native(df) === composed(df), "unstaged path (serialize+merge) diverges")
    val staged = df.repartition(col("k"))
    assert(native(staged) === composed(staged), "staged path diverges")
    // the all-null key produces the empty set -> ("", 0), never null
    val only3 = native(df).find(_.head == 3L).get
    assert(only3(1) === "" && only3(2) === 0)
  }

  test("distinct_sorted_concat: separator contract enforced by the expression itself, analysis-time") {
    // r15 advice: a directly-constructed DistinctSortedConcat (bypassing
    // the builder) with a non-foldable or null separator must fail in
    // checkInputDataTypes, never as an executor-side NPE mid-job
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.StringType
    val s = AttributeReference("s", StringType)()
    assert(!graft.functions.DistinctSortedConcat(s, s).checkInputDataTypes().isSuccess,
      "non-foldable separator must be an analysis-time type-check failure")
    assert(!graft.functions.DistinctSortedConcat(
      s, Literal.create(null, StringType)).checkInputDataTypes().isSuccess,
      "null separator must be an analysis-time type-check failure")
    assert(graft.functions.DistinctSortedConcat(
      s, Literal(";")).checkInputDataTypes().isSuccess,
      "the valid literal shape must stay accepted")
    // and through SQL the failure surfaces at analysis, before any job runs
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.range(3).selectExpr("cast(id as string) as s")
        .groupBy().agg(expr("distinct_sorted_concat(s, s)")).queryExecution
        .executedPlan
    }
  }

  test("eval_fence: identity values; filter stays ABOVE the spread exchange") {
    GraftFunctions.register(spark)
    val df = (1 to 100).map(i => (i.toLong, "w" * (i % 7 + 1))).toDF("id", "text")
    val fenced = df.repartition(4)
      .select(col("id"), expr("eval_fence(length(text) * 2)").as("score"))
      .filter(col("score") > 4)
    val plain = df
      .select(col("id"), (length(col("text")) * 2).as("score"))
      .filter(col("score") > 4)
    assert(fenced.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq ===
           plain.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
      "eval_fence must be a value-identity wrapper")
    // Plan law (the reason the fence exists, guide §4.4): the filter must
    // NOT be inlined through the fenced projection and pushed below the
    // exchange — tree prints root-first, so 'Filter' above 'Exchange'
    // means a smaller string index.
    val p = fenced.queryExecution.executedPlan.toString
    assert(p.contains("Filter") && p.contains("Exchange"), p)
    assert(p.indexOf("Filter") < p.indexOf("Exchange"),
      s"filter was pushed below the spread exchange:\n$p")
    // and WITHOUT the fence the same shape IS pushed below (the hazard is
    // real, not hypothetical — if Catalyst ever stops pushing there, the
    // fence can be retired)
    val unfenced = graft.Tables.documents(spark, sf).repartition(4)
      .select(col("doc_id"), (length(col("text")) * 2).as("score"))
      .filter(col("score") > 4)
    val up = unfenced.queryExecution.executedPlan.toString
    assert(up.indexOf("Exchange") < up.indexOf("Filter"),
      s"expected the unfenced filter to sink below the exchange:\n$up")
    // the spread scan face itself carries the law end-to-end
    val mp = graft.ops.SearchOps.matchQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(mp.indexOf("Filter") < mp.indexOf("Exchange"),
      s"q_search_match: analyzer filter sank below the spread exchange:\n$mp")
  }
}
