package graft

import graft.ops.SearchOps
import org.apache.spark.sql.functions._

class SuggestSpec extends SparkSpecBase {

  test("termSuggest: suggest_mode=missing skips indexed terms; candidates honor prefix, band, and distance") {
    val out = SearchOps.termSuggest(spark, sf).collect()
    assert(out.nonEmpty)
    val terms = out.map(_.getString(0)).toSet
    // 'window' is in the corpus → no suggestions for it (mode=missing)
    assert(!terms.contains("window"), "indexed term must not be suggested for")
    assert(terms.subsetOf(Set("strem", "custmer", "qurey")))
    out.foreach { r =>
      val (t, s, d) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(s.head === t.head, "prefix_length=1: first char must match")
      assert(math.abs(s.length - t.length) <= 2, "length band")
      assert(d >= 1 && d <= 2, "edit distance in [1, max_edits]")
      assert(jvmLev(t, s) === d, s"reported distance wrong for ($t, $s)")
      assert(r.getLong(3) > 0, "df must be positive")
    }
  }

  test("termSuggest: per-term rank order is (dist asc, df desc, suggestion asc), capped at topK") {
    val out = SearchOps.termSuggest(spark, sf, topK = 3).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val keys = rows.map(r => (r.getInt(2), -r.getLong(3), r.getString(1)))
      assert(keys.toSeq === keys.sortBy(identity).toSeq, "rank key order violated")
    }
  }

  test("termSuggest: top suggestion recovers the intended corpus word") {
    val out = SearchOps.termSuggest(spark, sf).collect()
    val best = out.groupBy(_.getString(0)).map { case (t, rows) =>
      t -> rows.minBy(r => (r.getInt(2), -r.getLong(3), r.getString(1))).getString(1)
    }
    assert(best("strem") === "stream")
    assert(best("custmer") === "customer")
    // 'qurey' is 2 edits from 'query' — accept it or an even-closer token
    assert(best.get("qurey").exists(s => jvmLev("qurey", s) <= 2))
  }

  test("completeSuggest: prefix-filtered vocab ranked by df desc, size-capped") {
    val out = SearchOps.completeSuggest(spark, sf, prefix = "s", size = 8).collect()
    assert(out.nonEmpty && out.length <= 8)
    out.foreach(r => assert(r.getString(0).startsWith("s")))
    val dfs = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(dfs.toSeq === dfs.sortBy(identity).toSeq, "df-desc order violated")
    // the cap binds: a wider ask returns at least as many rows
    assert(SearchOps.completeSuggest(spark, sf, prefix = "s", size = 50).count() >= out.length)
  }

  test("wildcardSearch: * and ? compile correctly; counts match an analyzer replay") {
    val out = SearchOps.wildcardSearch(spark, sf, pattern = "s?a*", k = 10).collect()
    assert(out.nonEmpty)
    val re = "s.a.*".r
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        SearchOps.analyze(org.apache.spark.sql.functions.col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out.foreach { r =>
      val hits = docs(r.getLong(0)).filter(t => re.pattern.matcher(t).matches())
      assert(r.getLong(1) === hits.distinct.length.toLong, s"n_terms doc ${r.getLong(0)}")
      assert(r.getLong(2) === hits.length.toLong, s"tf_total doc ${r.getLong(0)}")
    }
    // a literal % in the pattern must be escaped, not treated as a wildcard
    assert(SearchOps.wildcardSearch(spark, sf, pattern = "%").count() === 0)
  }

  test("phraseSuggest: cross product of per-term corrections, LM-ranked, present terms kept verbatim") {
    val out = SearchOps.phraseSuggest(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length === 3)
      assert(words(0) === "data", "present term must ride through unchanged")
      assert(jvmLev("sot", words(1)) <= 2 && words(1).head === 's')
      assert(jvmLev("grup", words(2)) <= 2 && words(2).head === 'g')
    }
    // scores strictly ordered desc over distinct phrases (which correction
    // wins is a data question — the sf0.01 oracle pins the values)
    val scores = out.map(_.getLong(1))
    assert(scores.toSeq === scores.sortBy(-_).toSeq)
    assert(out.map(_.getString(0)).distinct.length === out.length)
    assert(out.length >= 2, "expected both sot-corrections to survive")
  }

  test("phraseSuggest: a position with no in-vocab candidate yields no phrases at all") {
    val out = SearchOps.phraseSuggest(spark, sf, phrase = "data zzzqqx grup")
    assert(out.count() === 0)
  }

  test("disMaxSearch: score_fp = 2·max + (sum − max) over clause term-counts; any-clause match") {
    import org.apache.spark.sql.functions.col
    val clauses = Seq("data stream", "window batch", "slow query")
    val out = SearchOps.disMaxSearch(spark, sf, clauses, k = 15).collect()
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), SearchOps.analyze(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    out.foreach { r =>
      val cs = clauses.map(c => SearchOps.analyzeQuery(c).distinct.count(toks(r.getLong(0))))
      val expect = 2L * cs.max + (cs.sum - cs.max)
      assert(r.getLong(2) === expect, s"doc ${r.getLong(0)}: clauses $cs")
      assert(cs.max > 0, "dis_max must require at least one matching clause")
    }
    val scores = out.map(_.getLong(2))
    assert(scores.toSeq === scores.sortBy(-_).toSeq)
  }

  test("percolate: a pair fires iff the doc holds EVERY term of the registered query") {
    val out = SearchOps.percolate(spark, sf, k = 200).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) === 2L, "derived queries are 2-term ANDs"))
    // replay: doc tokens must cover both of the query's required terms,
    // and every non-matching (batch doc, query) pair must be absent
    import org.apache.spark.sql.functions._
    val batch = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(97L)) === 0)
      .select(col("doc_id"), SearchOps.analyze(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // recover the registered queries via the same vocab ranking
    val vocab = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(SearchOps.analyze(col("text")))).as("tok"))
      .groupBy("tok").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, df) => (-df, t) }.take(12).map(_._1)
    val queries = (0 to 10).map(i => i.toLong -> Set(vocab(i), vocab(i + 1))).toMap
    val fired = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((d, ts) <- batch; (qid, req) <- queries) {
      val expect = req.subsetOf(ts)
      assert(fired.contains((d, qid)) === expect, s"doc $d query $qid (req $req)")
    }
  }

  test("rankFeature + distanceFeature: fixed-point laws replayed; saturation and recency bounded") {
    val rf = SearchOps.rankFeatureSearch(spark, sf).collect()
    assert(rf.nonEmpty)
    val chars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rf.foreach { r =>
      val f = chars(r.getLong(0))
      val featFp = f * 1048576L / (f + 1000L)
      assert(r.getLong(2) === r.getInt(1).toLong * 1048576L + featFp, s"doc ${r.getLong(0)}")
      assert(featFp >= 0L && featFp < 1048576L, "saturation must stay below 1.0")
    }
    val dfq = SearchOps.distanceFeatureSearch(spark, sf).collect()
    assert(dfq.nonEmpty)
    val fps = dfq.map(_.getLong(2))
    assert(fps.max === 1048576L, "the origin user scores exactly 1.0")
    assert(fps.forall(v => v > 0L && v <= 1048576L))
    assert(fps.toSeq === fps.sortBy(-_).toSeq)
  }

  test("adjacencyMatrix: intersections bounded by singles; counts match an analyzer replay") {
    val out = SearchOps.adjacencyMatrix(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    import org.apache.spark.sql.functions.col
    val toks = Tables.documents(spark, sf)
      .select(SearchOps.analyze(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toSet)
    def n(p: Set[String] => Boolean) = toks.count(p).toLong
    Seq("data", "stream", "window").foreach { t =>
      assert(out(t) === n(_.contains(t)), s"single $t")
    }
    assert(out("data&stream") === n(s => s("data") && s("stream")))
    assert(out("data&stream") <= math.min(out("data"), out("stream")))
    assert(out("stream&window") <= math.min(out("stream"), out("window")))
  }

  test("adjacencyMatrix: a multi-word filter is a full query — ALL its terms must hit (r12 advice)") {
    import org.apache.spark.sql.functions.col
    val out = SearchOps.adjacencyMatrix(spark, sf, filters = Seq(
      "ds" -> "data stream", "w" -> "window")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, sf)
      .select(SearchOps.analyze(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toSet)
    def n(p: Set[String] => Boolean) = toks.count(p).toLong
    // the two-word filter counts docs containing BOTH terms — not, as the
    // pre-fix head-only matching did, every doc containing just "data"
    assert(out("ds") === n(s => s("data") && s("stream")))
    assert(out("ds") < n(_.contains("data")),
      "a conjunctive filter must be strictly narrower than its first term here")
    out.get("ds&w").foreach { c =>
      assert(c === n(s => s("data") && s("stream") && s("window")))
    }
  }

  test("samplerTerms: deterministic hash gate; counts bounded by the sampled-doc population") {
    val a = SearchOps.samplerTerms(spark, sf).collect().map(r => (r.getString(0), r.getLong(1)))
    val b = SearchOps.samplerTerms(spark, sf).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq, "hash-gated sample must be reproducible")
    import org.apache.spark.sql.functions._
    val nSampled = Tables.documents(spark, sf)
      .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(10L)) === 0).count()
    assert(nSampled > 0)
    a.foreach { case (t, c) => assert(c <= nSampled, s"token $t count exceeds sample size") }
    assert(a.map(_._2).toSeq === a.map(_._2).sortBy(-_).toSeq)
  }

  /** Independent classic-Levenshtein replay (no early exit). */
  private def jvmLev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
