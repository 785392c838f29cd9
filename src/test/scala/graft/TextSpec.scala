package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenCount: n_chars_calc matches source n_chars; token counts sane") {
    val out = TextOps.tokenCount(spark, sf)
    assert(out.filter(col("n_chars") =!= col("n_chars_calc")).count() === 0)
    assert(out.filter(col("n_tokens") < 0 || col("bpe_tokens") < col("n_tokens")).count() === 0)
  }

  test("tokenCount: empty and whitespace-only text edge cases") {
    val df = Seq((1L, "", 0), (2L, "   ", 3), (3L, "a b", 3)).toDF("doc_id", "text", "n_chars")
    df.createOrReplaceTempView("edge_docs")
    // reuse the same expressions via a temp table read
    val trimmed = trim(col("text"))
    val out = df.select(col("doc_id"),
      when(length(trimmed) === 0, lit(0)).otherwise(size(split(trimmed, "\\s+"))).as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) === 0); assert(out(2L) === 0); assert(out(3L) === 2)
  }

  test("langId: predictions restricted to the label set; en text classified en") {
    val out = TextOps.langId(spark, sf)
    val langs = Set("en", "de", "fr", "es", "zh")
    assert(out.filter(!col("lang_pred").isInCollection(langs)).count() === 0)
  }

  test("qualityScore: score within [0,1]; ratios non-negative") {
    val out = TextOps.qualityScore(spark, sf)
    assert(out.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
    assert(out.filter(col("punct_ratio") < 0 || col("stop_ratio") < 0).count() === 0)
  }

  test("lengthStats: percentiles ordered and bounded; doc counts reconcile") {
    val out = TextOps.lengthStats(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_chars").toDouble, r.getAs[Long]("max_chars").toDouble)
      val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
      assert(r.getAs[Double]("avg_chars") >= mn && r.getAs[Double]("avg_chars") <= mx)
    }
  }

  test("stratifiedSample: deterministic, keeps all 100%-rate strata, thins en") {
    val a = TextOps.stratifiedSample(spark, sf).collect().map(_.getLong(0)).sorted.toSeq
    val b = TextOps.stratifiedSample(spark, sf).collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b) // hash-gated, not rand(): stable across runs
    val total = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.stratifiedSample(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("de", "fr", "es").foreach(l => assert(kept.getOrElse(l, 0L) === total(l)))
    assert(kept("en") < total("en")) // 25% gate must drop most of the majority class
  }

  test("decontaminate: planted eval overlap is flagged, clean docs are not") {
    // eval doc 0 shares an 8-gram run with corpus doc 100; doc 101 is clean
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (0L, evalText),
      (100L, "prefix words " + evalText + " suffix words"),
      (101L, "entirely different content with no overlapping gram runs at all here"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_decon_docs/documents.parquet")
    val out = TextOps.decontaminate(spark, "/tmp/graft_decon_docs")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_contaminated_grams")).toMap
    assert(out.contains(100L) && out(100L) >= 1L)
    assert(!out.contains(101L))
    assert(!out.contains(0L)) // eval side never reports itself
  }

  test("bigramLogprob: seen pairs beat the backoff; held-out doc takes the unseen-pair path") {
    // training corpus: "red fish" is a frequent pair; "blue fish" never
    // occurs as a pair though both tokens are in vocabulary
    val trainDir = "/tmp/graft_bigram_train"
    Seq((1L, "red fish red fish red fish"), (2L, "blue sky blue sky"),
        (3L, "red fish blue sky"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$trainDir/documents.parquet")
    val scoreDir = "/tmp/graft_bigram_score"
    Seq((10L, "red fish"), (11L, "blue fish"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$scoreDir/documents.parquet")
    val out = graft.ops.TextOps.bigramLogprobWith(spark, scoreDir, trainDir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(out(10L)._1 === 1L && out(11L)._1 === 1L)
    // the seen pair interpolates pair + unigram mass; the unseen pair gets
    // only the 0.3-weighted unigram backstop — strictly lower
    assert(out(10L)._2 > out(11L)._2,
      s"seen ${out(10L)._2} must beat unseen ${out(11L)._2}")
    // backoff value replayed by hand: round(ln(0.3 · c(fish)/T) · 2^20),
    // T = 14 training tokens, c(fish) = 4
    val expected = math.rint(math.log(0.3 * (4.0 / 14.0)) * 1048576.0) / 1048576.0
    assert(math.abs(out(11L)._2 - expected) < 1e-5,
      s"backoff ${out(11L)._2} vs hand $expected")
  }

  test("dupNgramFraction: planted shared run scores, unique docs at zero") {
    // docs 1 and 2 share one exact 8-token run (1 shared 8-gram each);
    // doc 3 is unique. 8-token docs have exactly ONE 8-gram.
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, run), (2L, run), (3L, "totally unrelated words making one single unique gram"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/graft_dupgram_docs/documents.parquet")
    val out = TextOps.dupNgramFraction(spark, "/tmp/graft_dupgram_docs")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
         r.getAs[Double]("dup_frac"))).toMap
    assert(out(1L) === ((1L, 1L, 1.0)))
    assert(out(2L) === ((1L, 1L, 1.0)))
    assert(out(3L) === ((1L, 0L, 0.0)))
  }

  test("piiScrub: emails and phone-like runs counted and masked deterministically") {
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.org or +1 (555) 123-4567 thanks"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_pii_docs/documents.parquet")
    val out = TextOps.piiScrub(spark, "/tmp/graft_pii_docs")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") === 1)
    assert(out(1L).getAs[Int]("n_phonelike") === 1)
    assert(out(2L).getAs[Int]("n_emails") === 0 && out(2L).getAs[Int]("n_phonelike") === 0)
    // masking is deterministic and changes the content hash only when PII hit
    val again = TextOps.piiScrub(spark, "/tmp/graft_pii_docs")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("scrubbed_md5")).toMap
    assert(out(1L).getAs[String]("scrubbed_md5") === again(1L))
    val rawMd5 = Tables.documents(spark, "/tmp/graft_pii_docs")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).getAs[String]("scrubbed_md5") !== rawMd5(1L))
    assert(out(2L).getAs[String]("scrubbed_md5") === rawMd5(2L))
  }

  test("piiScrub: ip / card / phone classes are disjoint via the progressive cascade") {
    // each class counted on text with earlier classes masked: the IPv4 must
    // NOT also count as phone-like (digits+dots would match the digit-run
    // pattern), the card must not count as phone-like, and separated card
    // spellings (spaces, dashes, contiguous) all land in n_cards
    val df = Seq(
      (1L, "server at 10.0.255.31 answered"),             // ip only
      (2L, "pay with 4111 1111 1111 1111 today"),         // spaced card
      (3L, "or 4111-1111-1111-1111 and 4000123456789010"), // dashed + contiguous
      (4L, "call +7 (495) 123-45-67 now"),                // phone only
      (5L, "jane@example.org from 192.168.1.1 card 5500 0000 0000 0004 tel 8 800 2000 600"),
      (6L, "version 1.2.3 is not an ip, 3.14 is not pii"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_pii_docs2/documents.parquet")
    val out = TextOps.piiScrub(spark, "/tmp/graft_pii_docs2")
      .collect().map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) = (out(id).getAs[Int]("n_emails"), out(id).getAs[Int]("n_ips"),
      out(id).getAs[Int]("n_cards"), out(id).getAs[Int]("n_phonelike"))
    assert(counts(1L) === ((0, 1, 0, 0)))
    assert(counts(2L) === ((0, 0, 1, 0)))
    assert(counts(3L) === ((0, 0, 2, 0)))
    assert(counts(4L) === ((0, 0, 0, 1)))
    assert(counts(5L) === ((1, 1, 1, 1)))
    assert(counts(6L) === ((0, 0, 0, 0)))
    // no-PII rows keep their raw hash; every class masks when present
    val rawMd5 = Tables.documents(spark, "/tmp/graft_pii_docs2")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(1L, 2L, 3L, 4L, 5L).foreach(id =>
      assert(out(id).getAs[String]("scrubbed_md5") !== rawMd5(id), s"doc $id"))
    assert(out(6L).getAs[String]("scrubbed_md5") === rawMd5(6L))
  }

  test("fingerprint: whitespace/case-normalized texts collide, distinct texts don't") {
    val df = Seq(
      (1L, "The quick  brown fox"),
      (2L, "the QUICK brown\tfox"),
      (3L, "a different document")).toDF("doc_id", "text")
    val normalized = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val fp = df.select(col("doc_id"), md5(normalized.cast("binary")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("repetition: planted repeats produce exact gram fractions") {
    val df = Seq(
      (1L, "x y x y x y"),  // bigrams: "x y"×3, "y x"×2; trigrams all duplicated
      (2L, "a b c d"),      // no repeated grams at all
      (3L, "solo"))         // 1 token: one truncated bigram and trigram
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_rep_docs/documents.parquet")
    val out = graft.ops.TextOps.repetition(spark, "/tmp/graft_rep_docs")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") === 5L)
    assert(out(1L).getAs[Long]("top_bigram_n") === 3L)
    assert(out(1L).getAs[Double]("top_bigram_frac") === 0.6)
    assert(out(1L).getAs[Long]("n_trigrams") === 4L)
    assert(out(1L).getAs[Long]("dup_trigram_occ") === 4L)
    assert(out(1L).getAs[Double]("dup_trigram_frac") === 1.0)
    assert(out(2L).getAs[Long]("top_bigram_n") === 1L)
    assert(out(2L).getAs[Double]("dup_trigram_frac") === 0.0)
    assert(out(3L).getAs[Long]("n_bigrams") === 1L) // partial-gram edge rule
  }

  test("repetition + filterChain: shuffle-FREE — per-doc gram stats never repartition") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq(graft.ops.TextOps.repetition(spark, sf),
          graft.ops.TextOps.filterChain(spark, sf)).foreach { out =>
        out.collect()
        val plan = out.queryExecution.executedPlan
        val shuffles = plan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s }
        assert(shuffles.isEmpty,
          s"per-document metrics must not shuffle, got:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("corpusMix: shares sum to 1 and totals reconcile with the corpus") {
    val out = TextOps.corpusMix(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === Tables.documents(spark, sf).count())
    val shareSum = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    out.foreach(r => assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs")))
  }

  test("packChunks: greedy running-sum packing on a hand-checked fixture") {
    val df = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),
      (2L, Seq.fill(10)("w").mkString(" ")),
      (3L, Seq.fill(10)("w").mkString(" ")),
      (4L, Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_pack_docs/documents.parquet")
    // single shard, ctx=25: starts at 0,10,20,30 → chunks 0,0,0,1
    val out = graft.ops.TextOps.packChunks(spark, "/tmp/graft_pack_docs",
        nShards = 1, ctxTokens = 25)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("chunk_id")).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("packChunks: chunk overflow bounded by one document; ids unique per shard") {
    val out = graft.ops.TextOps.packChunks(spark, sf, nShards = 4, ctxTokens = 512)
    val byChunk = out.groupBy("chunk_id")
      .agg(sum("n_tokens").as("chunk_tokens"), max("n_tokens").as("max_doc"))
      .collect()
    // greedy start-offset packing: a chunk holds ≤ ctx + (its largest doc)
    byChunk.foreach { r =>
      assert(r.getAs[Long]("chunk_tokens") <= 512L + r.getAs[Int]("max_doc"),
        s"chunk ${r.get(0)} overflows beyond the one-document bound")
    }
    // shard encoded in the id: no collisions across shards
    assert(out.select("chunk_id", "shard").distinct().count() ===
      out.select("chunk_id").distinct().count())
  }

  test("filterChain: planted docs hit each rule in priority order") {
    val clean = "the cat sat on the mat and looked out of the window at the rain"
    val repetitive = Seq.fill(30)("the").mkString(" ") // long, stopword-rich, but one bigram
    val short = "hi"
    val df = Seq(
      (1L, clean, "en"), (2L, repetitive, "en"), (3L, short, "en"),
      (4L, clean, "fr")) // english text labeled fr → lang_mismatch
      .toDF("doc_id", "text", "lang")
    df.write.mode("overwrite").parquet("/tmp/graft_filter_docs/documents.parquet")
    val out = graft.ops.TextOps.filterChain(spark, "/tmp/graft_filter_docs")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("reason") === "kept" && out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[String]("reason") === "repetitive_bigram")
    assert(out(3L).getAs[String]("reason") === "low_quality")
    assert(out(4L).getAs[String]("reason") === "lang_mismatch" && !out(4L).getAs[Boolean]("keep"))
  }

  test("lengthApprox: sketch lands inside the exact rank windows, values anchor to lengthStats") {
    val approx = graft.ops.TextOps.lengthApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_bounds"), s"lang ${r.getString(0)}")
      assert(r.getAs[Boolean]("p90_in_bounds"), s"lang ${r.getString(0)}")
    }
    val exact = graft.ops.TextOps.lengthStats(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_docs"), r.getAs[Double]("p50"))).toMap
    approx.foreach { r =>
      val (n, p50) = exact(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Double]("exact_p50") === p50)
    }
  }

  test("unigramLogprob: one doc's score recomputed independently; probable text scores higher") {
    val out = graft.ops.TextOps.unigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("avg_logprob"))).toMap
    assert(out.nonEmpty)
    // ln P is always negative (no token has P=1 in a multi-token corpus)
    out.values.foreach { case (n, lp) => assert(n > 0 && lp < 0.0) }
    // independent recompute of doc 0 from raw text (driver-side replica of
    // the whole fit + fixed-point fold)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val all = texts.values.flatMap(toks).toSeq
    val cnt = all.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
    val total = all.size.toDouble
    val t0 = toks(texts(0L))
    // half-away-from-zero, matching Spark/DuckDB round (math.round is
    // half-toward-positive-infinity and would diverge on negative .5s)
    def rnd(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    val s0 = t0.map(t => rnd(math.log(cnt(t) / total) * 1048576.0)).sum
    val expected = BigDecimal((s0.toDouble / t0.size) / 1048576.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._1 === t0.size.toLong)
    assert(out(0L)._2 === expected)
  }

  test("normalizedCol: every Unicode class rewrites as documented") {
    val cases = Seq(
      ("a\u200bb\u200cc\ufeffd", "abcd"),          // zero-width + BOM stripped
      ("a\u0001b\u0007c\u007fd", "abcd"),          // control chars dropped
      ("\u2018quoted\u2019 \u201cdouble\u201d", "'quoted' \"double\""), // curly -> straight
      ("x\u2013y\u2014z", "x-y-z"),                // en/em dash -> hyphen
      ("a\u00a0b", "a b"),                        // NBSP -> space
      ("  a\t\tb \n c  ", "a b c"),               // collapse + trim
      ("a\u0000b", "ab"),                         // NUL dropped
      ("already clean", "already clean"))
    val df = cases.zipWithIndex
      .map { case ((in, want), i) => (i.toLong, in, want) }
      .toDF("id", "text", "want")
      .select(col("id"), col("want"),
        graft.ops.TextOps.normalizedCol(col("text")).as("got"))
    df.collect().foreach { r =>
      assert(r.getString(2) === r.getString(1), s"case ${r.getLong(0)}")
    }
  }

  test("perplexityBuckets: per-lang thirds, head ≥ tail, ntile balance") {
    val out = graft.ops.TextOps.perplexityBuckets(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(out.length.toLong === docs, "every doc must land in a bucket")
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Double]("avg_logprob"))).toMap
      if (rows.length >= 3) {
        assert(byBucket.keySet === Set("head", "middle", "tail"), lang)
        // ntile balance: bucket sizes differ by at most 1
        val sizes = byBucket.values.map(_.length)
        assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
        // ordering: every head score ≥ every middle score ≥ every tail score
        assert(byBucket("head").min >= byBucket("middle").max, lang)
        assert(byBucket("middle").min >= byBucket("tail").max, lang)
      }
    }
  }

  test("chunkDocs: hand fixture — starts, overlap, trailing short chunk, empty doc skipped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // 5 tokens, width 3 stride 2 → [a b c][c d e][e]
      (2L, "x y"),       // shorter than width → one whole-doc chunk
      (3L, "   "))       // empty after trim → no chunks
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.chunkDocsOn(docs, width = 3, stride = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_tokens"), r.getAs[String]("chunk_text")))
    assert(out.toSet === Set(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"), (1L, 2L, 1L, "e"),
      (2L, 0L, 2L, "x y")))
  }

  test("chunkDocs on the corpus: overlap invariant and full coverage") {
    val width = 64; val stride = 48
    val byDoc = graft.ops.TextOps.chunkDocs(spark, sf, width, stride).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))).toMap
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").filter(_.nonEmpty)).toMap
    assert(byDoc.keySet === docs.filter(_._2.nonEmpty).keys.toSet)
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id)
      // count + indices
      assert(chunks.length === (toks.length - 1) / stride + 1, s"doc $id")
      assert(chunks.map(_.getAs[Long]("chunk_idx")).toSeq ===
        (0L until chunks.length).toSeq)
      // every chunk is exactly its slice of the doc — so consecutive
      // chunks share width-stride tokens and concatenating each chunk's
      // first `stride` tokens (plus the last chunk's tail) rebuilds the doc
      chunks.foreach { c =>
        val s = c.getAs[Long]("chunk_idx").toInt * stride
        val want = toks.slice(s, s + width)
        assert(c.getAs[String]("chunk_text") === want.mkString(" "), s"doc $id")
        assert(c.getAs[Long]("chunk_tokens") === want.length.toLong)
      }
    }
  }

  test("perplexityBucketsApprox: sketch buckets track the exact NTILE split") {
    val exact = graft.ops.TextOps.perplexityBuckets(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val approx = graft.ops.TextOps.perplexityBucketsApprox(spark, sf).collect()
    assert(approx.length === exact.size, "same docs bucketed")
    val agree = approx.count(r =>
      exact(r.getAs[Long]("doc_id")) == r.getAs[String]("bucket"))
    // sketch cuts may move boundary-tied docs one bucket — bulk must agree
    assert(agree.toDouble / exact.size >= 0.9,
      s"only $agree/${exact.size} bucket assignments agree with exact NTILE")
    // never two buckets apart: a head doc can't be graded tail or vice versa
    val twoOff = approx.count { r =>
      val pair = Set(exact(r.getAs[Long]("doc_id")), r.getAs[String]("bucket"))
      pair == Set("head", "tail")
    }
    assert(twoOff === 0, s"$twoOff docs jumped head<->tail between faces")
  }

  test("compressionRatio: hand-computed fixed-point means per group") {
    // digit pieces count 1 token per character under the pre-tokenizer
    // (CASE non-letter piece → len), so ratios are hand-derivable without
    // touching the BPE merge fixture: "12 34" → 4 tokens.
    val docs = Seq(
      ("en", "s1", 8L, "12 34"),   // 4 tokens → ratio 2.0
      ("en", "s1", 12L, "12 34"),  // 4 tokens → ratio 3.0   (mean 2.5)
      ("en", "s2", 5L, ""),        // 0 tokens → guard divides by 1 → 5.0
      ("de", "s1", 9L, "567"))     // 3 tokens → ratio 3.0
      .toDF("lang", "source", "n_chars", "text")
    val out = graft.ops.TextOps.compressionRatioOn(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_chars_per_token"))).toMap
    assert(out(("en", "s1")) === ((2L, 2.5)))
    assert(out(("en", "s2")) === ((1L, 5.0)))
    assert(out(("de", "s1")) === ((1L, 3.0)))
  }

  test("klDivergence: identical sources sit at zero; a skewed source is strictly positive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kl").toString
    Seq(
      (1L, "alpha beta gamma delta", "same_a"),
      (2L, "alpha beta gamma delta", "same_b"),
      (3L, "alpha alpha alpha alpha alpha alpha alpha alpha omega", "skewed"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextOps.klDivergence(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("kl_fp")).toMap
    // same_a and same_b have identical distributions but differ from the
    // corpus mix (which includes the skew), so only exact symmetry holds
    assert(out("same_a") === out("same_b"))
    assert(out("skewed") > 0L)
    assert(out("skewed") > out("same_a"))
  }

  test("klDivergence: corpus-level Gibbs bound (sum is non-negative up to rounding)") {
    val out = graft.ops.TextOps.klDivergence(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // each term rounds to +-0.5 fp units; KL(P||Q) >= 0 exactly, so the
      // folded integer can dip below zero by at most n_terms/2
      assert(r.getAs[Long]("kl_fp") >= -r.getAs[Long]("n_terms"))
      assert(r.getAs[Long]("n_toks") >= r.getAs[Long]("n_terms"))
    }
  }

  test("temperatureMix: tau=2 flattens toward uniform; weights normalize; fp identities hold") {
    val out = graft.ops.TextOps.temperatureMix(spark, sf).collect()
    assert(out.length > 1)
    val tot = out.map(_.getAs[Long]("n_tokens")).sum.toDouble
    // flattening: every source's weight share is strictly closer to uniform
    // than its raw token share (the point of temperature sampling)
    val uniform = 1.0 / out.length
    val wDen = out.map(_.getAs[Long]("sqrt_share_fp")).sum
    out.foreach { r =>
      val raw = r.getAs[Long]("n_tokens") / tot
      val w = r.getAs[Long]("weight_fp").toDouble / 1048576.0
      assert(r.getAs[Long]("weight_fp") ===
        (1048576L * r.getAs[Long]("sqrt_share_fp")) / wDen)
      if (math.abs(raw - uniform) > 0.01)
        assert(math.abs(w - uniform) < math.abs(raw - uniform))
    }
    // integer weights sum to 2^20 up to truncation (one ulp per source)
    val wSum = out.map(_.getAs[Long]("weight_fp")).sum
    assert(wSum <= 1048576L && wSum >= 1048576L - out.length)
  }

  test("budgetMix: kept tokens never exceed the source budget; admission is prefix-closed in hash order") {
    val out = graft.ops.TextOps.budgetMix(spark, sf).collect()
    assert(out.length.toLong === Tables.documents(spark, sf).count(),
      "verdict covers every document")
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val budget = rows.head.getAs[Long]("budget_toks")
      assert(rows.map(_.getAs[Long]("budget_toks")).distinct.length === 1)
      val kept = rows.filter(_.getAs[Boolean]("keep"))
      // the budget is a hard cap on admitted tokens
      assert(kept.map(_.getAs[Long]("n_toks")).sum <= budget)
      // admission is a PREFIX of the running order: once over budget,
      // nothing later is admitted (keep ⇔ running ≤ budget, row by row)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("keep") ===
          (r.getAs[Long]("running_toks") <= budget))
      }
      val sorted = rows.sortBy(_.getAs[Long]("running_toks"))
      val keepFlags = sorted.map(_.getAs[Boolean]("keep"))
      assert(!keepFlags.dropWhile(identity).contains(true),
        "keeps must form a prefix of the hash-ordered admission sequence")
    }
  }

  test("domainCap: at most cap keeps per source, hash-ordered, full relation, deterministic") {
    val out = graft.ops.TextOps.domainCap(spark, sf, cap = 5).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.length.toLong === total, "verdict covers every document")
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) === math.min(5, rows.length))
      rows.foreach(r => assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("rk") <= 5)))
      // ranks are a permutation of 1..n within the source
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val again = graft.ops.TextOps.domainCap(spark, sf, cap = 5).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rk"))).toSet
    assert(again === out.map(r => (r.getLong(0), r.getAs[Long]("rk"))).toSet)
  }

  test("curriculumPack: chunk ids order head < middle < tail; packing stays within-bucket consistent") {
    val out = graft.ops.TextOps.curriculumPack(spark, sf).collect()
    assert(out.nonEmpty)
    // bucket occupies the top bits: every head chunk id sorts before every
    // middle, every middle before every tail
    val byBucket = out.groupBy(_.getAs[Long]("bucket_n"))
    assert(byBucket.keySet === Set(0L, 1L, 2L))
    val maxByBucket = byBucket.view.mapValues(_.map(_.getAs[Long]("chunk_id")).max).toMap
    val minByBucket = byBucket.view.mapValues(_.map(_.getAs[Long]("chunk_id")).min).toMap
    assert(maxByBucket(0L) < minByBucket(1L) && maxByBucket(1L) < minByBucket(2L))
    // bucket assignment agrees with the perplexity split
    val want = graft.ops.TextOps.perplexityBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("bucket") match {
        case "head" => 0L; case "middle" => 1L; case _ => 2L
      })).toMap
    out.foreach(r => assert(r.getAs[Long]("bucket_n") === want(r.getLong(0))))
    // running sums are per (bucket, shard) monotone and self-consistent
    out.groupBy(r => (r.getAs[Long]("bucket_n"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(0))
        var cum = 0L
        sorted.foreach { r =>
          cum += r.getAs[Int]("n_tokens").toLong
          assert(r.getAs[Long]("cum_tokens") === cum)
        }
      }
  }

  test("topNgrams: the planted boilerplate run dominates the report with the right occ and df") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("topng").toString
    val banner = "accept all cookies"
    Seq(
      (1L, s"$banner some words here"),
      (2L, s"other text $banner"),
      (3L, s"$banner and $banner again"),   // twice in one doc
      (4L, "totally unrelated content here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextOps.topNgrams(spark, dir).collect()
    val top = out.head
    assert(top.getString(0) === banner)
    assert(top.getAs[Long]("occ") === 4L)
    assert(top.getAs[Long]("df") === 3L)
    // occ-desc, gram-asc ordering holds throughout
    val keys = out.map(r => (r.getAs[Long]("occ"), r.getString(0)))
    assert(keys.sliding(2).forall { case Array((o1, g1), (o2, g2)) =>
      o1 > o2 || (o1 == o2 && g1 < g2) })
  }

  test("icpPack: chunks hold same-cell (related) docs in similarity order; id arithmetic tiles") {
    val out = graft.ops.TextOps.icpPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3).toLong, r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (_, cell, _, _, _, chunkId) =>
      assert((chunkId >> 32) === cell.toLong, "cell must ride the chunk id's top bits")
    }
    // within a cell: ranks are 1..n and cum_tokens is their running sum
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1L to rows.length), s"cell $cell ranks")
      var cum = 0L
      byRank.foreach { case (_, _, _, n, c, _) =>
        cum += n
        assert(c === cum, s"cell $cell cum drift")
      }
    }
    // a chunk groups only docs of ONE cell (semantic adjacency by construction)
    out.groupBy(_._6).foreach { case (cid, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"chunk $cid mixes cells")
    }
  }

  test("shuffleOrder: a seeded bijection — every chunk exactly once, contiguous positions, seed-sensitive") {
    import org.apache.spark.sql.functions.col
    val chunks = graft.ops.TextOps.packChunks(spark, sf)
      .select("chunk_id").distinct().collect().map(_.getLong(0)).toSet
    val out = graft.ops.TextOps.shuffleOrder(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet === chunks, "must be a permutation of the chunk set")
    assert(out.length === chunks.size)
    out.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // deterministic under the same seed, different under another
    val again = graft.ops.TextOps.shuffleOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again === out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
    val other = graft.ops.TextOps.shuffleOrder(spark, sf, seed = 18L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(other.map(_._1) === chunks, "every epoch still a bijection")
    assert(other !== again, "a new seed must yield a different permutation")
  }
}
