package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text-search operators: the Spark re-expression of the reference's
  * Elasticsearch query surface (reference: etl/json/es_movies.json:4-40
  * analyzer; etl/json/ETLTests-2.json query corpus — multi_match+fuzziness,
  * query_string, nested, term, terms aggregation).
  *
  * Design: no inverted index for the base operators — a scored full scan is
  * a single codegen'd stage and at 100 TB it parallelizes linearly, while the
  * analyzer/stemmer stays 100% built-in expressions (no UDFs). For repeated
  * interactive queries, `postingsIndex` materializes the classic
  * (token → doc) postings table: search becomes a broadcast semi-join against
  * query tokens instead of a corpus scan.
  *
  * Everything is deliberately RE2-compatible and replicated verbatim in the
  * DuckDB oracles: same tokenizer regex, same stopword list, same two-rule
  * stemmer, same fuzziness ladder — so correctness is cross-engine-checked,
  * not self-certified.
  */
object SearchOps {

  /** Lucene/ES "english" stopword list (the `english_stop` filter in the
    * reference's ru_en analyzer, es_movies.json:6-9). Canonical data lives
    * in [[graft.functions.RuEnAnalyzerDef]], shared with the native
    * expression.
    */
  val Stopwords: Seq[String] = graft.functions.RuEnAnalyzerDef.Stopwords

  /** Lucene/ES `_russian_` (snowball) stopword list — the `russian_stop`
    * filter of the same ru_en analyzer (es_movies.json:18-21). The reference
    * indexes a Russian-language catalog; dropping this half silently loses
    * every Cyrillic token (round-1 F10 gap).
    */
  val RuStopwords: Seq[String] = graft.functions.RuEnAnalyzerDef.RuStopwords

  private val AllStops: Seq[String] = Stopwords ++ RuStopwords

  /** Light two-rule English stemmer (possessive + plural), the
    * codegen-friendly, RE2-portable stand-in for the reference's
    * porter/possessive_english stemmers (es_movies.json:10-17). No
    * lookbehind — RE2 (DuckDB) has none. Only touches [a-z] tokens, so it
    * composes with the Russian rule below in either order.
    */
  private def stem(t: Column): Column =
    regexp_replace(regexp_replace(t, "'s$", ""), "([a-z]{2,}[^suoi])s$", "$1")

  /** Longest-suffix light Russian stemmer (russian_stemmer analog,
    * es_movies.json:22-25): the LAZY stem capture `{2,}?` makes the regex
    * engine try the shortest stem first, i.e. strip the LONGEST listed
    * suffix — same leftmost-first semantics in Java regex (Spark) and RE2
    * (DuckDB), which is what keeps the oracle bit-identical.
    */
  private[ops] val RuSuffixes = graft.functions.RuEnAnalyzerDef.RuSuffixes
  private def stemRu(t: Column): Column =
    regexp_replace(t, s"^([а-яё]{2,}?)($RuSuffixes)$$", "$1")

  /** ES `ru_en`-analyzer analog: standard-ish tokenize (Latin + Cyrillic) →
    * lowercase → ё-normalize → en+ru stopword removal → en+ru stem. Keeps
    * duplicate tokens (TF is meaningful).
    *
    * Dispatches to the native fused [[graft.functions.RuEnAnalyze]]
    * expression (one pass, compiled patterns, hash stopword probe) —
    * bit-identical to [[analyzeComposed]], which FunctionsSpec asserts and
    * the DuckDB oracles replay.
    */
  def analyze(text: Column): Column = call_function("ru_en_analyze", text)

  /** The composed built-ins form — the specification the native expression
    * is equality-tested against (and the shape the DuckDB oracle mirrors).
    */
  private[graft] def analyzeComposed(text: Column): Column =
    transform(
      filter(
        transform(split(lower(text), "[^a-z0-9а-яё']+"),
          t => translate(regexp_replace(t, "^'+|'+$", ""), "ё", "е")),
        t => t =!= "" && !t.isInCollection(AllStops)),
      t => stemRu(stem(t)))

  /** Analyze a query string at plan time (driver-side, same rules). */
  def analyzeQuery(q: String): Seq[String] = {
    val stops = AllStops.toSet
    q.toLowerCase.split("[^a-z0-9а-яё']+").toSeq
      .map(_.replaceAll("^'+|'+$", "").replace('ё', 'е'))
      .filter(t => t.nonEmpty && !stops(t))
      .map(_.replaceAll("'s$", "").replaceAll("([a-z]{2,}[^suoi])s$", "$1")
            .replaceAll(s"^([а-яё]{2,}?)($RuSuffixes)$$", "$1"))
  }

  /** ES fuzziness:auto ladder: 0 edits for len≤2, 1 for 3–5, 2 above. */
  def autoFuzz(token: String): Int =
    if (token.length <= 2) 0 else if (token.length <= 5) 1 else 2

  /** query_string / match: score = number of query terms present in the
    * analyzed text (term-match count; the BM25-lite the reference's golden
    * tests actually exercise). Top-k by (score desc, doc_id).
    */
  def matchQuery(spark: SparkSession, dir: String,
                 q: String = "data stream window", k: Int = 20): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = analyze(col("text"))
    val score = analyzeQuery(q)
      .map(t => array_contains(toks, t).cast("int"))
      .reduce(_ + _)
    d.select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** multi_match with fuzziness=auto (ETLTests-2.json:94-131): a query term
    * matches if ANY document token is within its edit-distance budget;
    * score = number of matched query terms.
    */
  def fuzzyQuery(spark: SparkSession, dir: String,
                 q: String = "streem qery", k: Int = 20): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = analyze(col("text"))
    val score = analyzeQuery(q).map { t =>
      val f = autoFuzz(t)
      // length band prefilter + threshold-bounded levenshtein (early exit,
      // returns -1 above the bound) — avoids full DP on hopeless tokens
      exists(toks, tok =>
        abs(length(tok) - lit(t.length)) <= f &&
        levenshtein(tok, lit(t), f).between(0, f)).cast("int")
    }.reduce(_ + _)
    d.select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Multi-field multi_match with fuzziness=auto and per-field boosts — the
    * reference's golden fuzzy query shape (ETLTests-2.json:94-131: "camp"
    * over actors_names/writers_names/title/description/genre, asserting the
    * top-1 hit). ES best_fields semantics: a term's contribution is the MAX
    * field weight among fields it fuzzy-matches; the doc score sums terms.
    *
    * Field derivations over the driver tables: title = leading slice of
    * text (boost 2.0), description = full text (1.0), names = a 3-customer
    * panel attached by key range — the actors_names analog (1.5), lang =
    * keyword field (1.0).
    */
  def multiFieldFuzzy(spark: SparkSession, dir: String,
                      q: String = "custommer streem windoe", k: Int = 20): DataFrame = {
    val d = Tables.documents(spark, dir)
    val names = Tables.customer(spark, dir)
      .groupBy(floor((col("c_custkey") - 1) / 3).cast("long").as("doc_id"))
      .agg(concat_ws(" ", sort_array(collect_set(col("c_name")))).as("names_text"))
    val joined = d.join(names, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("text"),
        coalesce(col("names_text"), lit("")).as("names_text"))
      // stage the four analyzed token arrays ONCE; every query term reads
      // them (multi-referenced non-cheap aliases survive CollapseProject)
      .select(col("doc_id"), col("lang"),
        analyze(substring(col("text"), 1, 48)).as("title_toks"),
        analyze(col("text")).as("body_toks"),
        analyze(col("names_text")).as("names_toks"))

    def fieldMatch(toks: Column, t: String): Column = {
      val f = autoFuzz(t)
      exists(toks, tok =>
        abs(length(tok) - lit(t.length)) <= f &&
        levenshtein(tok, lit(t), f).between(0, f)).cast("int")
    }
    val score = analyzeQuery(q).map { t =>
      greatest(
        fieldMatch(col("title_toks"), t) * lit(2.0),
        fieldMatch(col("names_toks"), t) * lit(1.5),
        fieldMatch(col("body_toks"), t) * lit(1.0),
        (col("lang") === t).cast("int") * lit(1.0))
    }.reduce(_ + _)

    joined.select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The Russian half of the ru_en analyzer under the driver's hash gate.
    * The test corpus is English-only, so the query derives a deterministic
    * mixed-language column (fixed token→Russian substitutions, including a
    * `_russian_` stopword) and then runs the full Cyrillic
    * tokenize→stop→stem pipeline over it. The oracle applies the identical
    * derivation + analyzer replica, so every Cyrillic rule is value-checked,
    * not just spec-asserted.
    */
  def matchQueryRu(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val d = Tables.documents(spark, dir)
    val ru = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "\\bstream\\b", "потоки и ручьи"),
      "\\bdata\\b", "данные"),
      "\\bwindow\\b", "окна")
    val toks = analyze(ru)
    // "поток данных окно" analyzes to (поток, данн, окн); the derived text's
    // потоки/данные/окна stem to the same forms — stemmer-level match, not
    // a literal string match
    val score = analyzeQuery("поток данных окно")
      .map(t => array_contains(toks, t).cast("int"))
      .reduce(_ + _)
    d.select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** ES `nested` query analog (ETLTests-2.json:144-179): build the nested
    * array-of-structs (customer → orders), predicate with `exists` on the
    * array elements — ES nested-doc semantics, one match suffices.
    */
  def nestedQuery(spark: SparkSession, dir: String): DataFrame = {
    val nested = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(collect_list(struct(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))).as("orders"))
    Tables.customer(spark, dir)
      .join(nested, col("c_custkey") === col("o_custkey"))
      .filter(exists(col("orders"),
        o => o("o_orderstatus") === "F" && o("o_totalprice") > 200000))
      .select(col("c_custkey"), col("c_name"),
        size(col("orders")).cast("long").as("n_orders"))
  }

  /** ES `term` exact-keyword lookup (ETLTests-2.json:192-228). */
  def termLookup(spark: SparkSession, dir: String, id: Long = 42L): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") === id)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** ES `terms` aggregation (ETLTests-2.json:291-326): top-100 analyzed
    * tokens by frequency, deterministic tie-break on token.
    */
  def termsAgg(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(analyze(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** The scale path for repeated interactive search: a materialized postings
    * relation (token, doc_id, tf). Search = semi-join on query tokens —
    * shuffle-free when the postings table is bucketed by token. Cited
    * pattern: inverted-index-as-relation (SURVEY §4 "custom" row).
    */
  def postingsIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(analyze(col("text"))).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Search via the postings index instead of a corpus scan. */
  def postingsSearch(postings: DataFrame, q: String, k: Int = 20): DataFrame = {
    val terms = analyzeQuery(q).distinct
    postings
      .filter(col("token").isInCollection(terms))
      .groupBy("doc_id")
      .agg(countDistinct("token").as("score"), sum("tf").as("tf_total"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Driver-gate face of the postings path: build-then-search in one plan.
    * The token IN-list prunes the postings BEFORE the (token, doc_id) group —
    * at scale the index is a materialized token-bucketed table and this
    * becomes a 3-bucket read, but the operator chain is identical.
    */
  def invertedSearch(spark: SparkSession, dir: String,
                     q: String = "data stream window", k: Int = 20): DataFrame =
    postingsSearch(postingsIndex(spark, dir), q, k)

  /** BM25-lite relevance ranking: `score(d) = Σ_t tf(t,d) · ln(N / df(t))` —
    * the deterministic, oracle-replayable counterpart of ES's BM25 order
    * (the reference's golden tests assert the top-1 `_id` of a relevance
    * query, reference etl/json/ETLTests-2.json:94-140, which match-count
    * scoring cannot reproduce on ties). Raw tf and pure ln-idf, no
    * saturation/length normalization: rank-equivalent to BM25 at the
    * reference corpus's short-field shapes, and every factor is a closed
    * IEEE expression both engines compute identically.
    *
    * Float determinism is by construction, not luck: the per-term partial
    * `sum(when(token = t, tf·idf))` aggregates AT MOST ONE row per doc
    * (postings are unique on (token, doc_id)) so no cross-partition
    * accumulation order exists, and the term partials fold in one FIXED
    * lexicographic order written into the plan — the oracle writes the same
    * fold. A bare `sum(tf·idf)` per doc would be order-nondeterministic in
    * both engines and could flip last-ulp bits run to run.
    *
    * Scale shape: the IN-list prunes postings before anything groups (token-
    * bucketed index ⇒ k-bucket read); df/idf is a ≤|terms|-row aggregate
    * broadcast back; one hash-agg by doc_id; TakeOrderedAndProject for the
    * top-k. N rides along as a 1-row broadcast, not a driver scalar.
    */
  def rankedSearch(spark: SparkSession, dir: String,
                   q: String = "data stream window", k: Int = 20): DataFrame =
    rankedPostingsSearch(
      postingsIndex(spark, dir),
      Tables.documents(spark, dir)
        .agg(count(lit(1)).cast("double").as("n_docs")),
      q, k)

  /** Ranking over an existing postings relation (token, doc_id, tf) and a
    * 1-row `n_docs` frame — the materialized-index face of [[rankedSearch]].
    */
  def rankedPostingsSearch(postings: DataFrame, nDocs: DataFrame,
                           q: String, k: Int = 20): DataFrame = {
    val terms = analyzeQuery(q).distinct.sorted // FIXED fold order, oracle-shared
    require(terms.nonEmpty, s"query '$q' analyzed to no terms")
    val matched = postings.filter(col("token").isInCollection(terms))
    val idfs = matched.groupBy("token")
      .agg(count(lit(1)).as("df")) // postings unique on (token, doc_id) ⇒ count = df
      .crossJoin(broadcast(nDocs))
      .select(col("token"), log(col("n_docs") / col("df").cast("double")).as("idf"))
    val partials = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("tf").cast("double") * col("idf"))).as(s"_s$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"_s$i"), lit(0.0)))
      .reduce(_ + _) // left fold in term order — same associativity as the SQL
    matched.join(broadcast(idfs), Seq("token"))
      .groupBy("doc_id")
      .agg(partials.head, partials.tail: _*)
      .select(col("doc_id"), round(total, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  // ---- DuckDB oracles: same tokenizer/stopwords/stemmers, replicated in SQL.
  private val duckStops =
    AllStops.map(s => s"'$s'").mkString("(", ", ", ")")
  /** DuckDB expression producing exactly `analyze(<textExpr>)`. */
  private def duckToksOf(textExpr: String): String =
    "list_transform(" +
      "list_filter(" +
      s"list_transform(string_split_regex(lower($textExpr), '[^a-z0-9а-яё'']+'), " +
      "t -> replace(regexp_replace(t, '^''+|''+$', ''), 'ё', 'е')), " +
      s"t -> t <> '' AND t NOT IN $duckStops), " +
      "t -> regexp_replace(regexp_replace(regexp_replace(t, '''s$', ''), " +
      s"'([a-z]{2,}[^suoi])s$$', '\\1'), '^([а-яё]{2,}?)($RuSuffixes)$$', '\\1'))"
  private val duckToks = duckToksOf("text")

  private def multiFieldOracle: String = {
    val terms = analyzeQuery("custommer streem windoe").map { t =>
      val f = autoFuzz(t)
      def m(toks: String) =
        s"CAST(len(list_filter($toks, x -> levenshtein(x, '$t') <= $f)) > 0 AS INT)"
      s"""greatest(
         |      ${m("title_toks")} * 2.0,
         |      ${m("names_toks")} * 1.5,
         |      ${m("body_toks")} * 1.0,
         |      CAST(lang = '$t' AS INT) * 1.0)""".stripMargin
    }.mkString("\n    + ")
    s"""WITH nm AS (
       |  SELECT CAST(floor((c_custkey - 1) / 3) AS BIGINT) AS doc_id,
       |         string_agg(DISTINCT c_name, ' ' ORDER BY c_name) AS names_text
       |  FROM customer GROUP BY 1),
       |base AS (
       |  SELECT d.doc_id, d.lang,
       |    ${duckToksOf("substr(d.text, 1, 48)")} AS title_toks,
       |    ${duckToksOf("d.text")} AS body_toks,
       |    ${duckToksOf("coalesce(nm.names_text, '')")} AS names_toks
       |  FROM documents d LEFT JOIN nm ON d.doc_id = nm.doc_id),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $terms AS score
       |  FROM base)
       |SELECT doc_id, lang, score FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_search_multifield" -> multiFieldOracle,
    "q_search_match" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(list_contains($duckToks, 'data') AS INT)
         |    + CAST(list_contains($duckToks, 'stream') AS INT)
         |    + CAST(list_contains($duckToks, 'window') AS INT) AS score
         |  FROM documents)
         |SELECT doc_id, lang, score FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_search_fuzzy" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter($duckToks, t -> levenshtein(t, 'streem') <= 2)) > 0 AS INT)
         |    + CAST(len(list_filter($duckToks, t -> levenshtein(t, 'qery') <= 1)) > 0 AS INT) AS score
         |  FROM documents)
         |SELECT doc_id, lang, score FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_search_match_ru" -> {
      val ruText = "regexp_replace(regexp_replace(regexp_replace(text, " +
        "'\\bstream\\b', 'потоки и ручьи', 'g'), " +
        "'\\bdata\\b', 'данные', 'g'), " +
        "'\\bwindow\\b', 'окна', 'g')"
      val toks = duckToksOf(ruText)
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(list_contains($toks, 'поток') AS INT)
         |    + CAST(list_contains($toks, 'данн') AS INT)
         |    + CAST(list_contains($toks, 'окн') AS INT) AS score
         |  FROM documents)
         |SELECT doc_id, lang, score FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin
    },
    "q_search_nested" ->
      """SELECT c.c_custkey, c.c_name,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderstatus = 'F' AND o.o_totalprice > 200000)""".stripMargin,
    "q_term_lookup" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 42",
    "q_inverted_search" ->
      s"""WITH p AS (
         |  SELECT doc_id, unnest($duckToks) AS token FROM documents),
         |pp AS (
         |  SELECT token, doc_id, COUNT(*) AS tf FROM p
         |  WHERE token IN ('data', 'stream', 'window')
         |  GROUP BY token, doc_id)
         |SELECT doc_id,
         |  CAST(COUNT(DISTINCT token) AS BIGINT) AS score,
         |  CAST(SUM(tf) AS BIGINT) AS tf_total
         |FROM pp GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_terms_agg" ->
      s"""SELECT token, COUNT(*) AS n
         |FROM (SELECT unnest($duckToks) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,
    "q_search_ranked" -> rankedOracle)

  /** Exact replay of [[rankedSearch]]: same analyzed postings, same ln-idf,
    * and the SAME fixed-order term fold (sorted terms, left-associative `+`)
    * so the double arithmetic is bit-identical. `ln` in DuckDB is natural log
    * (its `log` is log10 — do not swap).
    */
  private def rankedOracle: String = {
    val terms = analyzeQuery("data stream window").distinct.sorted
    val inList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    val fold = terms.map(t =>
      s"coalesce(sum(CASE WHEN token = '$t' THEN CAST(tf AS DOUBLE) * idf END), 0)")
      .mkString("\n    + ")
    s"""WITH p AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
       |pp AS (
       |  SELECT token, doc_id, COUNT(*) AS tf FROM p
       |  WHERE token IN $inList
       |  GROUP BY token, doc_id),
       |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
       |idfs AS (
       |  SELECT token, ln(n_docs / CAST(COUNT(*) AS DOUBLE)) AS idf
       |  FROM pp, n GROUP BY token, n_docs),
       |scored AS (
       |  SELECT doc_id,
       |    $fold AS s
       |  FROM pp JOIN idfs USING (token) GROUP BY doc_id)
       |SELECT doc_id, round(s, 6) AS score FROM scored
       |ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 20""".stripMargin
  }
}
