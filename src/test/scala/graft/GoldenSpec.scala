package graft

import graft.ops.{CatalogDocs, CatalogSearch}
import graft.streaming.CatalogEtl
import org.apache.spark.sql.functions._

/** The reference's 7 Postman goldens (etl/json/ETLTests-2.json:9-330)
  * replayed end-to-end over the real seed catalog (CatalogSeedFixture):
  * CatalogEtl tick → movies doc store → CatalogSearch, asserting the
  * reference's own expected values. This composes J1 (4-way denorm), F10
  * (ru_en analyzer), F11 (fuzzy multi_match), F12 (query_string), F14
  * (nested), A9 (terms agg), and T1-T4 (tick/watermark/tie-break) over
  * catalog-shaped data — the one composition the TPC-H oracle corpus never
  * exercises.
  */
class GoldenSpec extends SparkSpecBase {

  private lazy val work =
    java.nio.file.Files.createTempDirectory("graft_golden_work").toString
  private lazy val etl = new CatalogEtl(CatalogSeedFixture.dir, work)
  private lazy val ticked = etl.tickAll(spark)
  private lazy val movies = {
    ticked // force the ETL before reading the store
    spark.read.parquet(s"$work/movies_store").cache()
  }

  test("reconciliation: seed row counts and column sets survive extraction") {
    // tests/check_consistency/test_rows_num.py:34-53 / test_column_names.py
    val expected = Map("film_work" -> 999L, "genre" -> 26L, "person" -> 4166L,
      "genre_film_work" -> 2231L, "person_film_work" -> 5783L)
    for ((name, n) <- expected) {
      val df = spark.read.parquet(s"${CatalogSeedFixture.dir}/$name.parquet")
      assert(df.count() === n, s"$name row count")
    }
    // seed quirk (FIXTURES.md §A, refined): the 999 films carry only 5
    // distinct modified timestamps (200-row insert batches) — ~200-way
    // watermark ties, the T3 strictly-greater tie-break fodder
    val fw = spark.read.parquet(s"${CatalogSeedFixture.dir}/film_work.parquet")
    assert(fw.select(countDistinct(col("modified"))).head.getLong(0) === 5L)
  }

  test("ETL tick: full rebuild on tick 1, clean zero on tick 2 (T1-T4)") {
    assert(ticked === Map("movies" -> 999L, "genres" -> 26L, "persons" -> 4166L))
    // all-identical timestamps + strictly-greater watermark: caught up, no
    // starvation (the T3 tie-break the seed was built to exercise)
    assert(etl.tickAll(spark) === Map("movies" -> 0L, "genres" -> 0L, "persons" -> 0L))
    // doc-store shape matches the ES mapping (es_movies.json:42-106)
    assert(movies.columns.sorted.toSeq === Seq("actors", "actors_names",
      "description", "director", "genre", "id", "imdb_rating", "modified",
      "title", "writers", "writers_names"))
  }

  test("analyzer: plan-side and driver-side agree on the golden word panel") {
    import spark.implicits._
    val panel = Seq("camp", "camps", "campus", "campos", "capped", "came",
      "N/A", "Greg Camp's", "Martín", "classes", "movies", "going", "speed",
      "Robert N. Bradbury", "rock 'n' roll")
    val planSide = panel.toDF("w")
      .select(CatalogSearch.catalogAnalyze(col("w")).as("toks"))
      .collect().map(_.getSeq[String](0).toList)
    val driverSide = panel.map(CatalogSearch.analyzeQuery(_).toList)
    assert(planSide.toSeq === driverSide)
    // the porter1 forms the fuzzy golden depends on
    assert(CatalogSearch.analyzeQuery("campus") === Seq("campu"))
    assert(CatalogSearch.analyzeQuery("campos") === Seq("campo"))
    assert(CatalogSearch.analyzeQuery("capped") === Seq("cap"))
  }

  test("G1: movies doc count = 999") {
    assert(movies.count() === 999L)
  }

  test("G2: query_string N//A = 7 hits, none containing literal N/A") {
    val hits = CatalogSearch.queryString(movies, "N//A")
    assert(hits.count() === 7L)
    // Postman: response text must not contain 'N/A' (ETLTests-2.json:63)
    val full = movies.join(hits.select("id"), Seq("id"), "left_semi")
    val anyNa = full.select(max(
      concat_ws(" ", col("title"), col("description"), col("director"),
        concat_ws(" ", col("actors_names")), concat_ws(" ", col("writers_names")))
        .contains("N/A"))).head.getBoolean(0)
    assert(!anyNa)
  }

  test("G3: fuzzy multi_match camp = 24 hits, top-1 is Star Camp") {
    val hits = CatalogSearch.multiMatchFuzzy(movies, "camp").cache()
    assert(hits.count() === 24L)
    assert(hits.head.getString(0) === "6764dd98-6546-4ccf-95c5-74a63e980768")
    hits.unpersist()
    ()
  }

  test("G4: nested match actors.name 'Greg Camp' = 6 hits") {
    assert(CatalogSearch.nestedMatch(movies, "actors", "Greg Camp").count() === 6L)
  }

  test("G5: term by id → writers_names == [Craig Hutchinson]") {
    val d = CatalogSearch.termById(movies, "24eafcd7-1018-4951-9e17-583e2554ef0a")
    assert(d.count() === 1L)
    assert(d.select("writers_names").head.getSeq[String](0) === Seq("Craig Hutchinson"))
  }

  test("G6: term by id → empty director") {
    val d = CatalogSearch.termById(movies, "479f20b0-58d1-4f16-8944-9b82f5b1f22a")
    assert(d.count() === 1L)
    assert(d.select("director").head.getString(0) === "")
  }

  test("G7: genre terms aggregation = 26 buckets") {
    assert(CatalogSearch.genreTermsAgg(movies).count() === 26L)
  }

  test("genres and persons stores match the reference doc shapes") {
    val genres = spark.read.parquet(s"$work/genres_store")
    assert(genres.count() === 26L)
    assert(genres.columns.sorted.toSeq ===
      Seq("description", "film_ids", "id", "modified", "name"))
    // every film appears in at least one genre's film_ids (seed property)
    val covered = genres.select(explode(col("film_ids")).as("id")).distinct().count()
    assert(covered === movies.select("id").distinct().count()
      - movies.filter(size(col("genre")) === 0).count())

    val persons = spark.read.parquet(s"$work/persons_store")
    assert(persons.count() === 4166L)
    assert(persons.columns.sorted.toSeq === Seq("films", "full_name", "id", "modified"))
    // role encoding reaches the persons docs intact (dual-encoding P6 path)
    val roles = persons.select(explode(col("films")).as("f"))
      .select(col("f.role")).distinct().collect().map(_.getString(0)).toSet
    assert(roles === Set("actor", "director", "writer"))
  }
}
