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

  private[ops] def orderDocsDF(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
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
                 col("l_returnflag").as("flag"))))).as("lines"),
        count(lit(1)).as("n_lines"))

    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))

    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
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

  val oracle: Map[String, String] = Map(
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
