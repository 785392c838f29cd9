package graft

import org.apache.spark.sql.functions._

import graft.ops.QueryStringOps
import graft.ops.QueryStringOps._

/** The query_string SYNTAX layer: parse-tree fixtures (precedence,
  * adjacency, clause dropping) + compiled-query semantics against a direct
  * corpus read. The oracle side is hash-gated by q_search_query_string.
  */
class QueryStringSpec extends SparkSpecBase {

  private def p(q: String) = QueryStringOps.parseQueryString(q)

  test("precedence: AND binds before OR; NOT binds before AND") {
    // a AND b OR c  ≡  (a AND b) OR c — the operator-precedence fixture
    assert(p("data AND stream OR window") ===
      Some(OrN(AndN(TermN("text", "data"), TermN("text", "stream")),
        TermN("text", "window"))))
    // NOT a AND b  ≡  (NOT a) AND b
    assert(p("NOT data AND stream") ===
      Some(AndN(NotN(TermN("text", "data")), TermN("text", "stream"))))
    // parentheses override: a AND (b OR c)
    assert(p("data AND (stream OR window)") ===
      Some(AndN(TermN("text", "data"),
        OrN(TermN("text", "stream"), TermN("text", "window")))))
  }

  test("adjacency is the default operator OR; quoted phrases analyze to token sequences") {
    assert(p("data stream") ===
      Some(OrN(TermN("text", "data"), TermN("text", "stream"))))
    assert(p("\"big data stream\"") ===
      Some(PhraseN("text", Seq("big", "data", "stream"))))
    // a single-token phrase degrades to a term; field prefixes resolve,
    // aliases fold onto the default text field, lang is the keyword field
    assert(p("title:\"data\"") === Some(TermN("title", "data")))
    assert(p("description:data lang:EN") ===
      Some(OrN(TermN("text", "data"), TermN("lang", "en"))))
    // field GROUPS: the group inherits the prefix field; inner explicit
    // prefixes override; phrases inside groups take the group field
    assert(p("title:(data OR stream)") ===
      Some(OrN(TermN("title", "data"), TermN("title", "stream"))))
    assert(p("title:(data OR lang:en)") ===
      Some(OrN(TermN("title", "data"), TermN("lang", "en"))))
    assert(p("title:(\"big data\" AND stream)") ===
      Some(AndN(PhraseN("title", Seq("big", "data")), TermN("title", "stream"))))
  }

  test("empty-analyzed clauses drop as ES removes them; multi-token words expand with the default operator") {
    // `the` is a stopword: the AND collapses onto its surviving child
    assert(p("data AND the") === Some(TermN("text", "data")))
    assert(p("NOT the") === None) // NOT of a dropped clause drops too
    assert(p("the a an") === None)
    // the reference's golden N//A query: the analyzer splits on '/' and
    // then drops `a` as a stopword — one surviving term
    assert(p("N//A") === Some(TermN("text", "n")))
    assert(p("N//AB") === Some(OrN(TermN("text", "n"), TermN("text", "ab"))))
    // lowercase and/or/not are TERMS, not operators (or/and are stopwords
    // in the analyzer, so they drop; `not` survives as a term)
    assert(p("data or stream") ===
      Some(OrN(TermN("text", "data"), TermN("text", "stream"))))
  }

  test("compiled query agrees with a direct corpus read on every returned doc") {
    val sf001 = "/root/testdata/sf0.001"
    val out = QueryStringOps.queryString(spark, sf001, k = 1000).collect()
    assert(out.nonEmpty)
    val toks = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"),
        graft.ops.SearchOps.analyze(col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2))).toMap
    // default fixture: lang:en AND ("data stream" OR (window AND NOT error))
    out.foreach { r =>
      val (lang, ts) = toks(r.getLong(0))
      assert(lang == "en", "lang:en clause violated")
      val phrase = (" " + ts.mkString(" ") + " ").contains(" data stream ")
      val winNotErr = ts.contains("window") && !ts.contains("error")
      assert(phrase || winNotErr, "OR branch violated")
      // score = positively-matched leaves, counted INDEPENDENTLY of NOT
      // siblings (a doc admitted via the phrase branch still scores its
      // 'window' leaf even when 'error' blocks that AND branch's predicate)
      val expected = 1L + (if (phrase) 1L else 0L) +
        (if (ts.contains("window")) 1L else 0L)
      assert(r.getAs[Long]("score") === expected,
        "score = matched positive leaves")
    }
    // and the boolean face is COMPLETE: every doc the predicate admits is
    // returned (k beyond corpus size)
    val expectedIds = toks.collect { case (id, (lang, ts))
      if lang == "en" &&
        ((" " + ts.mkString(" ") + " ").contains(" data stream ") ||
         (ts.contains("window") && !ts.contains("error"))) => id }.toSet
    assert(out.map(_.getLong(0)).toSet === expectedIds)
  }

  test("NOT and field clauses compile to working exclusions") {
    val sf001 = "/root/testdata/sf0.001"
    val out = QueryStringOps.queryString(spark, sf001,
      q = "data AND NOT lang:en", k = 1000).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) != "en"))
    // pure-NOT score: only the positive leaf counts
    assert(out.forall(_.getAs[Long]("score") === 1L))
  }

  test("queryStringIndexed: row-identical to the scan face across clause shapes, incl. the NOT-dominated outer-join path") {
    val sf001 = "/root/testdata/sf0.001"
    def both(q: String): (Seq[(Long, String, Long)], Seq[(Long, String, Long)]) = {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      (rows(QueryStringOps.queryString(spark, sf001, q, k = 1000)),
        rows(QueryStringOps.queryStringIndexed(spark, sf001, q, k = 1000)))
    }
    // the default fixture: field prefix + phrase + parens + all operators
    val (s1, i1) = both(QueryStringOps.DefaultQ)
    assert(i1 === s1); assert(s1.nonEmpty, "vacuous fixture")
    // NOT-dominated: a doc with ZERO index hits must still match — this
    // exercises the constant-fold reachability check and the left join
    val (s2, i2) = both("lang:en AND NOT error")
    assert(i2 === s2); assert(s2.nonEmpty)
    // field-prefixed term + bare adjacency (default operator OR)
    val (s3, i3) = both("title:data window")
    assert(i3 === s3); assert(s3.nonEmpty)
    // phrase-only tree (no term atoms at all)
    val (s4, i4) = both("\"data stream\"")
    assert(i4 === s4); assert(s4.nonEmpty)
    // lang-only tree (no index atoms): the dim-only degenerate path
    val (s5, i5) = both("lang:ru")
    assert(i5 === s5)
  }
}
