package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The denormalized-document envelope: the ES movies-document shape
  * (reference: etl/main.py:24-38 SQL + :67-90 index_prep_movie;
  * es_movies.json:79-104 nested mappings) rebuilt over the star schema.
  *
  * This is the full nested pipeline the flat q_denorm_docs skips:
  *   - `collect_set(struct(…))` with a null guard  ≡ json_agg(DISTINCT
  *     jsonb_build_object(…)) FILTER (WHERE id IS NOT NULL)   (A2)
  *   - `coalesce(col, array())` empty-document default          (F2)
  *   - element-wise `filter`/`transform` role projections        (P6/F8) —
  *     dual role encodings accepted, like index_prep_movie's
  *     'director'/'DR' handling (etl/main.py:77-86)
  *   - comma-joined scalar summary of a filtered array            (F6)
  *
  * Scale: single shuffle on the fact key for the bridge aggregate; the
  * orders join co-partitions on the same key; dims broadcast. The nested
  * arrays stay bounded by lines-per-order (~7 for TPC-H-ish data) — nested
  * docs are safe when the 1:N fan-in is bounded; unbounded fan-ins (a
  * celebrity actor's films) belong in the persons-style doc keyed the other
  * way, exactly like the reference splits movies/persons indexes.
  */
object DocumentOps {

  case class LineRef(line_no: Int, part_id: Long, part_name: String, flag: String)
  case class OrderDoc(
      id: Long, order_date: String, status: String,
      customer: String, nation: String, region: String,
      lines: Seq[LineRef],
      returned_part_names: String, // F6: comma-joined filtered projection
      n_lines: Long)

  /** Typed nested documents, one per order — the Dataset[T] document
    * envelope (the analog of the reference's Base_Model/dataclass layer).
    */
  def orderDocuments(spark: SparkSession, dir: String): Dataset[OrderDoc] = {
    import spark.implicits._
    orderDocsDF(spark, dir).as[OrderDoc]
  }

  /** Semi-join prune: restrict `df` to rows whose `key` is in the dirty-id
    * frame (column `id`). This runs BEFORE any aggregate, so an incremental
    * rebuild scans only the dirty entities' rows — the shuffle-side
    * equivalent of the reference's `WHERE modified > %s` pushdown, never a
    * rebuild-everything-then-filter.
    */
  private def pruneTo(df: DataFrame, key: String, only: Option[DataFrame]): DataFrame =
    only match {
      case Some(ids) => df.join(ids.select(col("id").as(key)), Seq(key), "left_semi")
      case None => df
    }

  private[graft] def orderDocsDF(spark: SparkSession, dir: String,
                                 only: Option[DataFrame] = None): DataFrame = {
    // split aggregation (same pattern as denormDocs): the count must not
    // ride in the ObjectHashAggregate that carries the struct-set buffers —
    // the numeric side stays a codegen'd HashAggregate. r15: the fact
    // repartitions on l_orderkey as a STAGED exchange of raw narrow rows,
    // and the whole object aggregate (partial+final back-to-back) runs
    // downstream of it — the former shape serialized the partial
    // collect_set BUFFERS into the shuffle, which is where the time went
    // (PlanSpec pins buffers-above-exchange). The part join lands AFTER
    // the shuffle (broadcast under AQE), and the 1:1 join with the numeric
    // side is co-partitioned on the same key (broadcast while the order
    // count is small, SMJ-without-exchange at scale). Note column pruning
    // keeps the numeric side on its own narrow scan (no exchange reuse) —
    // measured that is still the right trade: 1.46-1.65 -> 0.94-1.20 s at
    // sf0.1, 0.73x DuckDB on identical algebra.
    val liBase = pruneTo(Tables.lineitem(spark, dir), "l_orderkey", only)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_returnflag"))
      .repartition(col("l_orderkey"))
    val numeric = liBase.groupBy(col("l_orderkey").as("n_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
    // part/customer are UNHINTED (they scale with the corpus; a forced
    // broadcast() is never demoted and would OOM at warehouse SF) — AQE
    // broadcasts them while small, shuffles when not. nation/region stay
    // hinted: constant 25/5 rows at every SF.
    val structs = liBase
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"), "left")
      .groupBy(col("l_orderkey"))
      .agg(
        // A2: distinct struct array, null-guarded (a left-join miss on part
        // must not materialize a null-struct member — the reference's A6
        // bug is deliberately NOT replicated)
        sort_array(collect_set(when(col("p_partkey").isNotNull,
          struct(col("l_linenumber").as("line_no"),
                 col("l_partkey").as("part_id"),
                 col("p_name").as("part_name"),
                 col("l_returnflag").as("flag"))))).as("lines"))
    val li = structs.join(numeric, col("l_orderkey") === col("n_orderkey"))
      .drop("n_orderkey")

    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))

    pruneTo(Tables.orders(spark, dir), "o_orderkey", only)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .join(cust, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey").as("id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderstatus").as("status"),
        col("c_name").as("customer"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        coalesce(col("lines"), array()).as("lines"), // F2 empty default
        // P6+F8+F6: filter by role (both encodings), project a field, join
        // distinct NAMES (two lines may reference the same part): dedup after
        // the projection, not just at struct level
        array_join(array_distinct(sort_array(transform(
          filter(coalesce(col("lines"), array()),
            l => l("flag") === "R" || l("flag") === "r"),
          l => l("part_name")))), ",").as("returned_part_names"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }

  /** Sink face: the documents as JSON strings keyed by id — what
    * BulkIndexSink pushes (to_json only at the boundary, F3).
    */
  def docsAsJson(spark: SparkSession, dir: String): DataFrame = {
    val d = orderDocsDF(spark, dir)
    d.select(col("id"), to_json(struct(d.columns.map(col): _*)).as("doc"))
  }

  /** Oracle face: deterministic flattening of the SAME nested build —
    * proves the struct pipeline against DuckDB without relying on
    * cross-engine struct serialization.
    */
  def denormNested(spark: SparkSession, dir: String): DataFrame =
    orderDocsDF(spark, dir).select(
      col("id"), col("order_date"), col("status"), col("customer"),
      col("nation"), col("region"),
      concat_ws(";", sort_array(transform(col("lines"),
        l => concat_ws(":", l("line_no"), l("part_id"), l("flag"))))).as("lines_flat"),
      size(col("lines")).cast("long").as("n_distinct_lines"),
      col("returned_part_names"), col("n_lines"))

  // ---------------------------------------------------------------------
  // Dim-keyed document pipelines (J2/J3 proper): the reference rebuilds
  // THREE documents per tick, not one — movies (fact-keyed, above) plus
  // genres and persons (dimension-keyed, aggregating fact references UNDER
  // the dim row; etl/main.py:40-49 and :51-60). Re-expressed on the star
  // schema: part plays genre (ids list), supplier plays person (array of
  // {film_id, role} structs).
  // ---------------------------------------------------------------------

  case class GenreDoc(id: Long, name: String, brand: String, film_ids: Seq[String])
  case class FilmRef(film_id: Long, role: String)
  case class PersonDoc(id: Long, full_name: String, films: Seq[FilmRef])

  /** Genre-style pipeline (etl/main.py:40-49): dim LEFT JOIN bridge,
    * `STRING_AGG(DISTINCT fact_id::text)` split into an id array (the
    * reference splits on load, etl/main.py:101).
    *
    * Scale: the bridge aggregates FIRST (one shuffle on l_partkey, map-side
    * partial collect_set), then joins the dim — never fact×dim before the
    * group. The per-dim id list is unbounded at 100 TB (a hot part appears in
    * millions of orders) — same semantics as the reference's STRING_AGG; a
    * real deployment caps it (`slice`) or keeps the posting-list form
    * (SearchOps.invertedIndex) instead of one giant row.
    */
  private[graft] def genreDocsDF(spark: SparkSession, dir: String,
                                 only: Option[DataFrame] = None): DataFrame = {
    // raw narrow rows shuffle via a staged repartition, the object agg
    // runs whole downstream — the r15 denormNested finding (serializing
    // partial collect_set buffers into the shuffle is the slow part)
    // applies family-wide: measured 0.84 -> 0.69 s at sf0.1 here
    val bridge = pruneTo(Tables.lineitem(spark, dir), "l_partkey", only)
      // raw LONGS through the exchange; the string cast happens after the
      // shuffle inside the aggregate (a UTF8 id is ~2x the long's 8 bytes,
      // and shuffle bytes are the quantity this shape optimizes)
      .select(col("l_partkey"), col("l_orderkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_set(col("l_orderkey").cast("string"))).as("film_ids"))
    pruneTo(Tables.part(spark, dir), "p_partkey", only)
      .join(bridge, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey").as("id"),
        col("p_name").as("name"),
        col("p_brand").as("brand"),
        coalesce(col("film_ids"), array()).as("film_ids"))
  }

  /** Typed face — the array form the loader ships (main.py:101 post-split). */
  def genreDocuments(spark: SparkSession, dir: String): Dataset[GenreDoc] = {
    import spark.implicits._
    genreDocsDF(spark, dir).as[GenreDoc]
  }

  /** Oracle face: the STRING_AGG string + the array length, deterministic on
    * both engines (string-sorted ids, the exact wire form before the split).
    *
    * Computed at the STRING level directly (same flat-face treatment as
    * [[personDocs]]): the aggregation collects the already-cast id strings
    * with only the two needed columns in flight, and the wire string +
    * count are derived once per dim row from that set — no intermediate
    * array face re-projected on top. DimDocsSpec proves this face equal to
    * the typed [[genreDocuments]] build.
    */
  def genreDocs(spark: SparkSession, dir: String): DataFrame = {
    // distinct_sorted_concat: the reference's STRING_AGG(DISTINCT ... ORDER
    // BY) as ONE native aggregate instead of the composed
    // concat_ws/sort_array/collect_set/size form — measured at parity with
    // the composition (scan+shuffle dominate), kept for semantic fidelity
    // and the single-buffer plan; FunctionsSpec pins bit-equality through
    // both exchange shapes
    val ids = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey")) // longs through the shuffle
      .repartition(col("l_partkey")) // staged exchange: see genreDocsDF
      .groupBy(col("l_partkey"))
      .agg(expr("distinct_sorted_concat(cast(l_orderkey as string), ',')").as("fj"))
    Tables.part(spark, dir)
      .join(ids, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey").as("id"),
        col("p_name").as("name"),
        col("p_brand").as("brand"),
        coalesce(col("fj.joined"), lit("")).as("film_ids"),
        coalesce(col("fj.n"), lit(0)).cast("long").as("n_films"))
  }

  /** Person-style pipeline (etl/main.py:51-60):
    * `json_agg(DISTINCT jsonb_build_object('film_id', …, 'role', …))` ≡
    * distinct struct array. Role analog: the lineitem return flag. Same
    * aggregate-bridge-first scale shape as genreDocs.
    */
  private[graft] def personDocsDF(spark: SparkSession, dir: String,
                                  only: Option[DataFrame] = None): DataFrame = {
    val films = pruneTo(Tables.lineitem(spark, dir), "l_suppkey", only)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_returnflag"))
      .repartition(col("l_suppkey")) // staged exchange: see genreDocsDF
      .groupBy(col("l_suppkey"))
      .agg(sort_array(collect_set(struct(
        col("l_orderkey").as("film_id"),
        col("l_returnflag").as("role")))).as("films"))
    pruneTo(Tables.supplier(spark, dir), "s_suppkey", only)
      .join(films, col("s_suppkey") === col("l_suppkey"), "left")
      .select(
        col("s_suppkey").as("id"),
        col("s_name").as("full_name"),
        coalesce(col("films"), array()).as("films"))
  }

  def personDocuments(spark: SparkSession, dir: String): Dataset[PersonDoc] = {
    import spark.implicits._
    personDocsDF(spark, dir).as[PersonDoc]
  }

  /** Oracle face: string-flattened film refs (sorted as strings so both
    * engines order identically) + distinct-struct count.
    *
    * Computed at the STRING level directly (the "ref" encodes both struct
    * fields, so distinct strings ≡ distinct structs): one collect_set of
    * flat strings and one sort, instead of aggregating struct sets and then
    * re-sorting their string projections per row. DimDocsSpec proves this
    * face equal to the typed [[personDocuments]] build — the same
    * flat-face-optimized-separately pattern as denormDocs.
    *
    * Measured cost floor (round 4, sf0.1): the collect_set itself IS the
    * time — scan+concat 0.22 s, codegen count 0.20 s, collect_set 0.68 s,
    * and sort_array + concat_ws add <2% on top, so a fused native
    * sorted-concat aggregate has nothing to save; a codegen'd
    * dedup-then-collect_list two-stage was measured 30% SLOWER (second
    * shuffle). r15 revision of that floor: part of the "collect_set cost"
    * was serializing PARTIAL set buffers into the shuffle — the staged
    * repartition (raw rows shuffle, whole object agg downstream, the
    * denormNested finding) takes the face 0.93–1.09 → 0.82 s measured.
    * The residual ~1.8× vs DuckDB's string_agg DISTINCT is the per-row
    * object-hash-aggregate cost, not plan structure. r16 closed the
    * question: an interleaved A/B against collect_list WITHOUT dedup
    * (dedup deferred to eval) measured 0.74 vs 0.77 s — every variant
    * pays the same buffer cost, so ~1.4× is the documented floor
    * (BASELINE.md round-16 note).
    */
  def personDocs(spark: SparkSession, dir: String): DataFrame = {
    val refs = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        concat_ws(":", col("l_orderkey"), col("l_returnflag")).as("ref"))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"))
      // the native fused aggregate (see genreDocs): one UTF8String buffer
      .agg(expr("distinct_sorted_concat(ref, ';')").as("fj"))
    Tables.supplier(spark, dir)
      .join(refs, col("s_suppkey") === col("l_suppkey"), "left")
      .select(
        col("s_suppkey").as("id"),
        col("s_name").as("full_name"),
        coalesce(col("fj.joined"), lit("")).as("films_flat"),
        coalesce(col("fj.n"), lit(0)).cast("long").as("n_films"))
  }

  val oracle: Map[String, String] = Map(
    "q_genre_docs" ->
      """WITH b AS (
        |  SELECT l_partkey,
        |    string_agg(DISTINCT CAST(l_orderkey AS VARCHAR), ','
        |      ORDER BY CAST(l_orderkey AS VARCHAR)) AS film_ids,
        |    COUNT(DISTINCT l_orderkey) AS n_films
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p.p_partkey AS id, p.p_name AS name, p.p_brand AS brand,
        |  COALESCE(b.film_ids, '') AS film_ids,
        |  COALESCE(b.n_films, 0) AS n_films
        |FROM part p LEFT JOIN b ON p.p_partkey = b.l_partkey""".stripMargin,
    "q_person_docs" ->
      """WITH f AS (
        |  SELECT l_suppkey,
        |    string_agg(DISTINCT CAST(l_orderkey AS VARCHAR) || ':' || l_returnflag, ';'
        |      ORDER BY CAST(l_orderkey AS VARCHAR) || ':' || l_returnflag) AS films_flat,
        |    COUNT(DISTINCT (l_orderkey, l_returnflag)) AS n_films
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s.s_suppkey AS id, s.s_name AS full_name,
        |  COALESCE(f.films_flat, '') AS films_flat,
        |  COALESCE(f.n_films, 0) AS n_films
        |FROM supplier s LEFT JOIN f ON s.s_suppkey = f.l_suppkey""".stripMargin,
    "q_denorm_nested" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    string_agg(DISTINCT CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) || ':' || l_returnflag,
        |               ';' ORDER BY CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) || ':' || l_returnflag) AS lines_flat,
        |    COUNT(DISTINCT (l_linenumber, l_partkey, p_name, l_returnflag)) AS n_distinct_lines,
        |    COALESCE(string_agg(DISTINCT CASE WHEN l_returnflag IN ('R','r') THEN p_name END,
        |               ',' ORDER BY CASE WHEN l_returnflag IN ('R','r') THEN p_name END), '') AS returned_part_names,
        |    COUNT(*) AS n_lines
        |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |  GROUP BY l_orderkey)
        |SELECT o.o_orderkey AS id,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |  o.o_orderstatus AS status,
        |  c.c_name AS customer, n.n_name AS nation, r.r_name AS region,
        |  COALESCE(li.lines_flat, '') AS lines_flat,
        |  COALESCE(li.n_distinct_lines, 0) AS n_distinct_lines,
        |  COALESCE(li.returned_part_names, '') AS returned_part_names,
        |  COALESCE(li.n_lines, 0) AS n_lines
        |FROM orders o
        |LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin)
}
