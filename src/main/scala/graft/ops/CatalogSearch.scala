package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES query surface over the catalog doc store — the operators the
  * reference's 7 Postman goldens exercise (etl/json/ETLTests-2.json:9-330):
  * query_string, multi_match+fuzziness:auto with best_fields scoring, nested
  * match, term-by-id, terms aggregation.
  *
  * Analyzer: the index mapping (etl/json/es_movies.json:4-40) runs standard
  * tokenize → lowercase → english_stop → PORTER stem → possessive →
  * russian_stop/stem. Two deliberate differences from [[SearchOps.analyze]]
  * (whose light stemmer is pinned by the DuckDB oracle corpus):
  *
  *  - the tokenizer keeps ACCENTED Latin letters as token characters
  *    ("Martín" is one token, not "mart"+"n") — ES's standard tokenizer is
  *    Unicode-aware, and the seed's golden query_string("N//A") = 7 hits
  *    counts exactly the standalone-"n" tokens (5 middle initials + 2
  *    quoted 'n'), which an ASCII-only tokenizer miscounts as 20;
  *  - porter1-style plural/participle stripping (campus→campu, campos→campo,
  *    capped→cap), which the golden fuzzy "camp" = 24 requires — the light
  *    [-suoi]s rule finds only 22 of the 24.
  *
  * Both rule sets are validated end-to-end by GoldenSpec against the
  * reference's own expected values, not self-certified.
  *
  * Scale: every operator is one codegen'd projection over the doc store plus
  * (for the scored fuzzy) an explode + broadcast idf join + two aggregations
  * keyed by doc id — no cartesian products, no driver-side data collects.
  */
object CatalogSearch {

  private val AllStops: Seq[String] =
    graft.functions.RuEnAnalyzerDef.Stopwords ++
    graft.functions.RuEnAnalyzerDef.RuStopwords

  /** Unicode-aware token charset: ASCII letters/digits, apostrophe,
    * Cyrillic, Latin-1 Supplement + Extended-A/B + Additional (the accented
    * letters the seed's person names use).
    */
  private val TokSplit = "[^a-z0-9а-яё'À-ɏḀ-ỿ]+"

  /** Porter1-style stemmer-lite, applied to pure [a-z'] tokens only:
    * possessive 's; step 1a (sses→ss, ies→i, ss kept, else final s
    * dropped — NO -us exception, unlike porter2: campus→campu, the form the
    * reference's golden fuzzy count needs); step 1b lite ((vowel)ed/ing
    * stripped with at/bl/iz→+e and double-consonant undoubling; eed kept).
    */
  private def stem1(t: Column): Column = {
    val poss = regexp_replace(t, "'s?$", "")
    val a    = regexp_replace(poss, "(ss|i)es$", "$1")
    val b    = regexp_replace(a, "([^s])s$", "$1")
    val d    = when(b.rlike("[aeiouy][a-z]*eed$"), b)
      .otherwise(regexp_replace(b, "([aeiouy][a-z]*)(ing|ed)$", "$1"))
    // fixups only when a strip actually happened (Porter's step-1b coda)
    val fixed = when(d.rlike("(at|bl|iz)$"), concat(d, lit("e")))
      .otherwise(regexp_replace(d, "([bcdfghjkmnpqrtvwx])\\1$", "$1"))
    val stemmed = when(d === b, d).otherwise(fixed)
    when(t.rlike("^[a-z']+$"), stemmed).otherwise(t)
  }

  /** The ru_en analyzer, catalog flavor (see class doc for the two
    * divergences from [[SearchOps.analyze]]).
    */
  def catalogAnalyze(text: Column): Column =
    transform(
      filter(
        transform(split(lower(text), TokSplit),
          t => translate(regexp_replace(t, "^'+|'+$", ""), "ё", "е")),
        t => t =!= "" && !t.isInCollection(AllStops)),
      t => stem1(t))

  /** Driver-side mirror of [[catalogAnalyze]] for query strings. GoldenSpec
    * asserts plan-side and driver-side agree on a word panel.
    */
  def analyzeQuery(q: String): Seq[String] = {
    val stops = AllStops.toSet
    // Locale.ROOT: the plan side lowercases with Spark's locale-independent
    // Lower; a default-locale toLowerCase would diverge on e.g. tr_TR
    // (I → dotless ı) and silently miss every index term
    q.toLowerCase(java.util.Locale.ROOT).split(TokSplit).toSeq
      .map(_.replaceAll("^'+|'+$", "").replace('ё', 'е'))
      .filter(t => t.nonEmpty && !stops(t))
      .map(stem1Str)
  }

  private def stem1Str(t0: String): String = {
    if (!t0.matches("^[a-z']+$")) return t0
    var t = t0.replaceAll("'s?$", "")
    t = t.replaceAll("(ss|i)es$", "$1")
    t = t.replaceAll("([^s])s$", "$1")
    if (!t.matches(".*[aeiouy][a-z]*eed$")) {
      val d = t.replaceAll("([aeiouy][a-z]*)(ing|ed)$", "$1")
      if (d != t) {
        t = if (d.matches(".*(at|bl|iz)$")) d + "e"
            else d.replaceAll("([bcdfghjkmnpqrtvwx])\\1$", "$1")
      }
    }
    t
  }

  /** The text fields query_string searches: every ru_en-analyzed field of
    * the movies mapping (es_movies.json:56-80). genre/id are keyword fields
    * (exact whole values — a free-text term never matches them) and nested
    * actors/writers are excluded from root-level query_string, both per ES
    * semantics.
    */
  private val TextScalarFields = Seq("title", "description", "director")
  private val TextArrayFields  = Seq("actors_names", "writers_names")

  /** ES query_string (golden G2, ETLTests-2.json:45-90): "//" unescapes to
    * "/", the term is analyzed, a doc hits when any text field contains any
    * query token. Score = number of matched query terms (term-match count).
    */
  def queryString(docs: DataFrame, q: String): DataFrame = {
    val toks = analyzeQuery(q.replace("//", "/"))
    require(toks.nonEmpty, s"query_string '$q' analyzed to nothing")
    val perTerm = toks.map { t =>
      val one = lit(Array(t))
      // coalesce to false: a NULL text field (description is nullable)
      // makes its overlap NULL, and `false || NULL` is NULL — without the
      // guard one missing field poisons the whole term sum and drops docs
      // that matched on OTHER fields (ES treats a missing field as
      // simply not matching)
      coalesce(
        (TextScalarFields.map(f => arrays_overlap(catalogAnalyze(col(f)), one)) ++
         TextArrayFields.map(f =>
           exists(col(f), v => arrays_overlap(catalogAnalyze(v), one))))
          .reduce(_ || _), lit(false)).cast("int")
    }
    docs.select(col("id"), col("title"), perTerm.reduce(_ + _).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
  }

  /** ES fuzziness:auto ladder (same as [[SearchOps.autoFuzz]]). */
  private def autoFuzz(token: String): Int =
    if (token.length <= 2) 0 else if (token.length <= 5) 1 else 2

  /** multi_match with fuzziness:auto over
    * actors_names/writers_names/title/description/genre — golden G3
    * (ETLTests-2.json:94-140), which asserts BOTH the hit count and the
    * top-scored doc. Scoring is BM25-lite best_fields:
    *
    *   field score = Σ_terms (1 − edits/(budget+1)) · idf(term) / √(1+|field|)
    *   doc score   = max over fields
    *
    * with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) over corpus-wide doc
    * frequency. Exactness, rarity, and field-length norm are what make the
    * 2-token title "Star Camp" outrank description mentions — the same
    * forces as Lucene's practical scoring. genre participates as a keyword
    * field (whole raw values, case-sensitive).
    *
    * Plan: one projection stages the analyzed token arrays; explode to
    * (id, field, flen, tok); fuzzy-filter per term; the surviving term set
    * is tiny so its df frame broadcast-joins back; two hash aggs (field,
    * then doc). The doc-count scalar rides a broadcast 1-row crossJoin —
    * nothing data-sized touches the driver.
    */
  def multiMatchFuzzy(docs: DataFrame, q: String): DataFrame = {
    val terms = analyzeQuery(q)
    require(terms.nonEmpty, s"multi_match '$q' analyzed to nothing")

    val staged = docs.select(
      col("id"),
      catalogAnalyze(col("title")).as("f_title"),
      catalogAnalyze(col("description")).as("f_description"),
      flatten(transform(col("actors_names"), v => catalogAnalyze(v))).as("f_actors_names"),
      flatten(transform(col("writers_names"), v => catalogAnalyze(v))).as("f_writers_names"),
      col("genre").as("f_genre")) // keyword: raw whole values

    val fieldNames = Seq("f_title", "f_description", "f_actors_names",
      "f_writers_names", "f_genre")
    val long = staged
      .select(col("id"), explode(array(fieldNames.map(f =>
        struct(lit(f).as("field"), col(f).as("toks"))): _*)).as("fx"))
      .select(col("id"), col("fx.field").as("field"),
        size(col("fx.toks")).as("flen"), explode(col("fx.toks")).as("tok"))

    // per query term: fuzzy-filter, tag with term + edit distance
    val matched = terms.map { t =>
      val b = autoFuzz(t)
      long
        .filter(abs(length(col("tok")) - lit(t.length)) <= b &&
          levenshtein(col("tok"), lit(t), b).between(0, b))
        .withColumn("qterm", lit(t))
        .withColumn("exactness",
          lit(1.0) - levenshtein(col("tok"), lit(t), b).cast("double") / (b + 1))
    }.reduce(_ unionByName _)

    // idf over corpus-wide doc frequency of each MATCHED index term — the
    // candidate term set is edit-distance-bounded, so this frame is tiny
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val termDf = matched.groupBy(col("tok")).agg(countDistinct(col("id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"))

    val fieldScores = matched.join(broadcast(termDf), Seq("tok"))
      .groupBy(col("id"), col("field"), col("flen"))
      .agg(sum(col("exactness") * col("idf")).as("raw"))
      .select(col("id"),
        (col("raw") / sqrt(col("flen").cast("double") + 1.0)).as("fscore"))

    fieldScores.groupBy(col("id")).agg(max(col("fscore")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
  }

  /** ES nested match (golden G4, ETLTests-2.json:144-188): OR over analyzed
    * query tokens against the nested structs' `name` — one matching element
    * qualifies the doc (ES nested-doc semantics).
    */
  def nestedMatch(docs: DataFrame, nestedCol: String, q: String): DataFrame = {
    val toks = lit(analyzeQuery(q).toArray)
    docs
      .filter(exists(col(nestedCol),
        a => arrays_overlap(catalogAnalyze(a.getField("name")), toks)))
      .select(col("id"), col("title"))
      .orderBy(col("id").asc)
  }

  /** ES term query on the keyword id (goldens G5/G6). */
  def termById(docs: DataFrame, id: String): DataFrame =
    docs.filter(col("id") === lit(id))

  /** ES terms aggregation on the genre keyword (golden G7,
    * ETLTests-2.json:291-330): bucket per distinct value, count desc.
    */
  def genreTermsAgg(docs: DataFrame, size: Int = 100): DataFrame =
    docs.select(explode(col("genre")).as("genre"))
      .groupBy(col("genre")).agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("genre").asc)
      .limit(size)
}
