package graft

import graft.ops.SearchOps
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  test("analyze: lowercase, stopword removal, stemming, duplicate preservation") {
    val df = Seq(
      "The models and THE MODELS",         // stop 'the'/'and' out, models→model ×2… (dups kept)
      "cat's toys",                        // possessive + plural
      "").toDF("text")
    val got = df.select(SearchOps.analyze(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("model", "model"))
    assert(got(1) === Seq("cat", "toy"))
    assert(got(2) === Seq.empty[String])
  }

  test("analyze: Cyrillic tokens survive, Russian stopwords drop, suffixes stem") {
    val df = Seq(
      "Потоки данных и окна",         // и is a _russian_ stopword
      "ёлки Ёлки elki",               // ё-normalization + case fold
      "смешанный text stream models"  // mixed-language row
    ).toDF("text")
    val got = df.select(SearchOps.analyze(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("поток", "данн", "окн"))   // stopword и dropped
    assert(got(1) === Seq("елк", "елк", "elki"))     // ёлки → елк both cases
    assert(got(2) === Seq("смешанн", "text", "stream", "model"))
  }

  test("analyze: Russian stemmer strips the LONGEST listed suffix (lazy stem)") {
    val got = Seq("словами данными операциями").toDF("text")
      .select(SearchOps.analyze(col("text"))).head.getSeq[String](0)
    assert(got === Seq("слов", "данн", "операц"))
  }

  test("matchQueryRu: Russian query terms hit the derived mixed-language rows") {
    val out = SearchOps.matchQueryRu(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("score") >= 1 && r.getAs[Int]("score") <= 3))
    // the corpus derivation replaces stream/data/window, so top rows must
    // match all three stems
    assert(out.head.getAs[Int]("score") === 3)
  }

  test("analyzeQuery mirrors the column analyzer") {
    val viaCol = Seq("The Model's trainings DATA").toDF("text")
      .select(SearchOps.analyze(col("text"))).head.getSeq[String](0)
    assert(SearchOps.analyzeQuery("The Model's trainings DATA") === viaCol)
  }

  test("autoFuzz ladder matches ES fuzziness:auto") {
    assert(SearchOps.autoFuzz("ab") === 0)
    assert(SearchOps.autoFuzz("abc") === 1)
    assert(SearchOps.autoFuzz("abcde") === 1)
    assert(SearchOps.autoFuzz("abcdef") === 2)
  }

  test("matchQuery: scores bounded by #query terms, ordered desc") {
    val out = SearchOps.matchQuery(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("score") >= 1 && r.getAs[Int]("score") <= 3))
    val scores = out.map(_.getAs[Int]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("fuzzyQuery: exact term also matches its own typo budget") {
    // 'stream' is within levenshtein 2 of query typo 'streem'
    val hits = SearchOps.fuzzyQuery(spark, sf).collect()
    val direct = SearchOps.matchQuery(spark, sf, "stream", 500).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    if (direct.nonEmpty) {
      assert(hits.map(_.getAs[Long]("doc_id")).exists(direct))
    }
  }

  test("multiFieldFuzzy golden: field boosts pick a known top-1 doc (reference top-1 _id shape)") {
    val dir = "/tmp/graft_mf_fixture"
    // doc 0: query terms only in BODY past the 48-char title cut (weight 1.0)
    // doc 1: 'stream' inside the title slice (weight 2.0) → must win
    // doc 2: no match at all → filtered out
    Seq(
      (0L, "x y z pad pad pad pad pad pad pad pad pad pad stream window customer", "en"),
      (1L, "stream window pad pad pad pad pad pad pad pad pad pad pad customer", "en"),
      (2L, "nothing relevant here at all", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, "Customer#000000001"), (2L, "Customer#000000002"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SearchOps.multiFieldFuzzy(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("doc_id") === 1L, out.mkString("; "))
    assert(!out.exists(_.getAs[Long]("doc_id") == 2L))
    // title boost really is the separator: doc 1 outranks doc 0
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byId(1L) > byId(0L))
  }

  test("nestedQuery: every hit really has a qualifying order; n_orders correct") {
    val out = SearchOps.nestedQuery(spark, sf)
    val recheck = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
      .select("o_custkey").distinct()
    assert(out.count() === recheck.count())
    val total = out.select(sum("n_orders")).head.getLong(0)
    val expected = Tables.orders(spark, sf)
      .join(recheck, Seq("o_custkey"), "left_semi").count()
    assert(total === expected)
  }

  test("termsAgg: counts reconcile to total token volume of the top tokens") {
    val out = SearchOps.termsAgg(spark, sf, 10).collect()
    assert(out.length === 10)
    val ns = out.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("rankedSearch golden: rare-term doc outranks the higher-raw-tf common-term doc") {
    val dir = "/tmp/graft_ranked_docs"
    Seq((1L, "alpha beta beta"),              // rare 'beta' ×2 + common 'alpha'
        (2L, "alpha alpha alpha alpha"),      // most raw matches, all common
        (3L, "gamma delta"))                  // no query terms
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val rows = SearchOps.rankedSearch(spark, dir, "alpha beta", 10).collect()
    // ES-flavored relevance: idf demotes 'alpha' (df=2) vs 'beta' (df=1), so
    // doc 1 wins despite doc 2's higher raw term count — exactly the ordering
    // a match-count score cannot produce
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val expected1 = math.log(3.0 / 2.0) + 2.0 * math.log(3.0 / 1.0)
    val expected2 = 4.0 * math.log(3.0 / 2.0)
    assert(math.abs(rows(0).getDouble(1) - expected1) < 1e-6)
    assert(math.abs(rows(1).getDouble(1) - expected2) < 1e-6)
  }

  test("rankedSearch on the real corpus: top-k, descending, strictly positive scores") {
    val rows = SearchOps.rankedSearch(spark, sf).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0))
  }

  test("postingsSearch ≡ matchQuery on distinct-term scoring") {
    val postings = SearchOps.postingsIndex(spark, sf).cache()
    val viaIndex = SearchOps.postingsSearch(postings, "data stream window", 20)
      .select("doc_id", "score").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    val viaScan = SearchOps.matchQuery(spark, sf, "data stream window", 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("score").toLong).toMap
    // same docs, same scores (top-k tie sets may order differently; compare as map)
    viaScan.foreach { case (id, s) => assert(viaIndex.getOrElse(id, s) === s) }
    postings.unpersist()
  }
}
