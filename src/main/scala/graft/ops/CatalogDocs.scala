package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document builders over the reference's OWN catalog schema (film_work /
  * genre / person / genre_film_work / person_film_work — postgres/init.sql:
  * 36-105), producing the exact ES doc shapes the reference indexes
  * (etl/main.py:67-119, mapping etl/json/es_movies.json:42-106).
  *
  * This is the seed-parity surface: [[graft.streaming.CatalogEtl]] wires
  * these builders into the incremental pipeline and GoldenSpec replays the
  * reference's 7 Postman goldens (etl/json/ETLTests-2.json:9-330) over the
  * real 999-film seed fixture end-to-end.
  *
  * Scale shape: identical to the TPC-H-shaped [[DocumentOps]] — both bridge
  * sides are pre-aggregated per film BEFORE joining the fact row, so persons
  * and genres never cross-product (the reference's single 4-way LEFT JOIN +
  * GROUP BY, etl/main.py:24-37, re-expressed without the row explosion).
  * Dims are broadcast-sized here; at warehouse scale the same plan shuffles
  * on film id only.
  */
object CatalogDocs {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.parquetCached(spark, s"$dir/$name.parquet")

  /** Django writes either verbose role names or 2-letter codes
    * (my_app/movies/models.py:37-42) — the reference's doc builder accepts
    * both (etl/main.py:78-88: `== 'actor' or == 'AC'`).
    */
  private val ActorRoles    = Seq("actor", "AC")
  private val WriterRoles   = Seq("writer", "WR")
  private val DirectorRoles = Seq("director", "DR")

  private def pruneTo(df: DataFrame, key: String, only: Option[DataFrame]): DataFrame =
    only.fold(df)(ids => df.join(ids.select(col("id").as(key)), Seq(key), "left_semi"))

  /** The movies doc (etl/main.py:67-90): id, imdb_rating, genre[], title,
    * description, director (comma-joined, '' if none), actors_names[],
    * writers_names[], actors[{id,name}], writers[{id,name}], and the
    * greatest-of-three watermark column `modified`
    * (etl/main.py:25: greatest(fw.modified, max(p.modified), max(g.modified))).
    *
    * Array order: the reference's json_agg(DISTINCT jsonb) orders by jsonb
    * value; we sort by (name, id) — a sanctioned divergence (SURVEY A6), no
    * golden asserts multi-element order.
    */
  def movieDocs(spark: SparkSession, dir: String,
                only: Option[DataFrame] = None): DataFrame = {
    val fw = pruneTo(t(spark, dir, "film_work"), "id", only)

    val pfw = t(spark, dir, "person_film_work")
      .select(col("film_work_id"), col("person_id"), col("role"))
    val person = t(spark, dir, "person")
      .select(col("id").as("person_id"), col("full_name"),
        col("modified").as("p_modified"))
    // prune bridges by the same dirty-id set before the shuffle-side agg
    val pj = pruneTo(pfw, "film_work_id", only)
      .join(person, Seq("person_id"))

    def roleNames(roles: Seq[String]): Column =
      sort_array(collect_set(
        when(col("role").isInCollection(roles), col("full_name"))))
    def roleStructs(roles: Seq[String]): Column =
      sort_array(collect_set(
        when(col("role").isInCollection(roles),
          struct(col("person_id").as("id"), col("full_name").as("name")))))

    val persons = pj
      .repartition(col("film_work_id")) // staged exchange: see genreDocs
      .groupBy(col("film_work_id"))
      .agg(
        // director: comma-joined names, '' when absent (etl/main.py:78-79)
        concat_ws(",", roleNames(DirectorRoles)).as("director"),
        roleNames(ActorRoles).as("actors_names"),
        roleNames(WriterRoles).as("writers_names"),
        roleStructs(ActorRoles).as("actors"),
        roleStructs(WriterRoles).as("writers"),
        max(col("p_modified")).as("p_modified"))

    val gj = pruneTo(t(spark, dir, "genre_film_work"), "film_work_id", only)
      .select(col("film_work_id"), col("genre_id"))
      .join(t(spark, dir, "genre")
        .select(col("id").as("genre_id"), col("name"),
          col("modified").as("g_modified")), Seq("genre_id"))
    val genres = gj
      .repartition(col("film_work_id")) // staged exchange: see genreDocs
      .groupBy(col("film_work_id"))
      .agg(sort_array(collect_set(col("name"))).as("genre"),
        max(col("g_modified")).as("g_modified"))

    val emptyStr = array().cast("array<string>")
    val emptyRef = array().cast("array<struct<id:string,name:string>>")
    fw.join(persons, fw("id") === persons("film_work_id"), "left")
      .join(genres, fw("id") === genres("film_work_id"), "left")
      .select(
        fw("id"),
        fw("rating").as("imdb_rating"),
        coalesce(col("genre"), emptyStr).as("genre"),
        fw("title"),
        fw("description"),
        coalesce(col("director"), lit("")).as("director"),
        coalesce(col("actors_names"), emptyStr).as("actors_names"),
        coalesce(col("writers_names"), emptyStr).as("writers_names"),
        coalesce(col("actors"), emptyRef).as("actors"),
        coalesce(col("writers"), emptyRef).as("writers"),
        greatest(fw("modified"), col("p_modified"), col("g_modified"))
          .as("modified"))
  }

  /** The genres doc (etl/main.py:93-105): id, name, description, film_ids.
    * The reference STRING_AGGs then re-splits (main.py:41,103); we keep the
    * sorted array directly.
    */
  def genreDocs(spark: SparkSession, dir: String,
                only: Option[DataFrame] = None): DataFrame = {
    val g = pruneTo(t(spark, dir, "genre"), "id", only)
    val bridge = pruneTo(
      t(spark, dir, "genre_film_work").select(col("genre_id"), col("film_work_id")),
      "genre_id", only)
      // staged exchange (the r15 denormNested finding, kept in lockstep
      // with DocumentOps.genreDocsDF): raw rows shuffle, the whole object
      // aggregate runs downstream — never partial set buffers into the wire
      .repartition(col("genre_id"))
      .groupBy(col("genre_id"))
      .agg(sort_array(collect_set(col("film_work_id"))).as("film_ids"))
    g.join(bridge, g("id") === bridge("genre_id"), "left")
      .select(g("id"), g("name"), g("description"),
        coalesce(col("film_ids"), array().cast("array<string>")).as("film_ids"),
        g("modified"))
  }

  /** The persons doc (etl/main.py:108-119): id, full_name,
    * films[{film_id, role}].
    */
  def personDocs(spark: SparkSession, dir: String,
                 only: Option[DataFrame] = None): DataFrame = {
    val p = pruneTo(t(spark, dir, "person"), "id", only)
    val films = pruneTo(
      t(spark, dir, "person_film_work")
        .select(col("person_id"), col("film_work_id"), col("role")),
      "person_id", only)
      .repartition(col("person_id")) // staged exchange: see genreDocs
      .groupBy(col("person_id"))
      .agg(sort_array(collect_set(
        struct(col("film_work_id").as("film_id"), col("role")))).as("films"))
    p.join(films, p("id") === films("person_id"), "left")
      .select(p("id"), p("full_name"),
        coalesce(col("films"),
          array().cast("array<struct<film_id:string,role:string>>")).as("films"),
        p("modified"))
  }

  /** Movies change feed — the reference's three disjunctive watermark
    * predicates (etl/main.py:35: fw.modified > wm OR p.modified > wm OR
    * g.modified > wm) as one (id, modified) stream: a film is dirty when
    * itself, any of its people, or any of its genres changed.
    */
  def movieChanges(dir: String)(spark: SparkSession): DataFrame = {
    val fw = t(spark, dir, "film_work").select(col("id"), col("modified"))
    val viaPerson = t(spark, dir, "person_film_work")
      .select(col("film_work_id"), col("person_id"))
      .join(t(spark, dir, "person").select(col("id").as("person_id"), col("modified")),
        Seq("person_id"))
      .select(col("film_work_id").as("id"), col("modified"))
    val viaGenre = t(spark, dir, "genre_film_work")
      .select(col("film_work_id"), col("genre_id"))
      .join(t(spark, dir, "genre").select(col("id").as("genre_id"), col("modified")),
        Seq("genre_id"))
      .select(col("film_work_id").as("id"), col("modified"))
    fw.unionByName(viaPerson).unionByName(viaGenre)
  }

  def genreChanges(dir: String)(spark: SparkSession): DataFrame =
    t(spark, dir, "genre").select(col("id"), col("modified"))

  def personChanges(dir: String)(spark: SparkSession): DataFrame =
    t(spark, dir, "person").select(col("id"), col("modified"))
}
