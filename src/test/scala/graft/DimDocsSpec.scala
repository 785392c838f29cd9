package graft

import graft.ops.DocumentOps
import org.apache.spark.sql.functions._

/** Dim-keyed document pipelines (J2/J3): genre-style id lists and
  * person-style {film_id, role} struct arrays, aggregated under the
  * dimension row (etl/main.py:40-60 shapes).
  */
class DimDocsSpec extends SparkSpecBase {

  test("genreDocuments: film_ids are exactly the distinct orders of the part") {
    val docs = DocumentOps.genreDocuments(spark, sf)
    // a part referenced by several orders
    val sampleKey = Tables.lineitem(spark, sf).groupBy("l_partkey")
      .agg(countDistinct("l_orderkey").as("n"))
      .orderBy(desc("n"), asc("l_partkey")).head.getAs[Long]("l_partkey")
    val doc = docs.filter(col("id") === sampleKey).head()
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === sampleKey)
      .select(col("l_orderkey").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(doc.film_ids === expected)
    // name/brand come from the dim row itself
    val dim = Tables.part(spark, sf).filter(col("p_partkey") === sampleKey).head()
    assert(doc.name === dim.getAs[String]("p_name"))
    assert(doc.brand === dim.getAs[String]("p_brand"))
  }

  test("genreDocs oracle face matches the typed face") {
    val flat = DocumentOps.genreDocs(spark, sf)
    val row = flat.filter(col("n_films") > 1).orderBy("id").head()
    assert(row.getAs[String]("film_ids").split(",").length ===
      row.getAs[Long]("n_films"))
    // empty-reference dims (if any) get '' / 0, never null
    assert(flat.filter(col("film_ids").isNull || col("n_films").isNull).count() === 0)
    // the string-level aggregation is the same document the typed build ships
    val typed = DocumentOps.genreDocuments(spark, sf).collect()
      .map(d => d.id -> d.film_ids.mkString(","))
      .toMap
    flat.collect().foreach { r =>
      assert(r.getAs[String]("film_ids") === typed(r.getAs[Long]("id")))
    }
  }

  test("personDocuments: films hold distinct (order, role) pairs of the supplier") {
    val docs = DocumentOps.personDocuments(spark, sf)
    val sampleKey = Tables.lineitem(spark, sf).groupBy("l_suppkey")
      .count().orderBy(desc("count"), asc("l_suppkey")).head.getAs[Long]("l_suppkey")
    val doc = docs.filter(col("id") === sampleKey).head()
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey") === sampleKey)
      .select("l_orderkey", "l_returnflag").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(doc.films.map(f => (f.film_id, f.role)).toSet === expected)
    // a supplier can ship the same order with different return flags — the
    // struct distinct keeps both roles, like the reference's person pipeline
    assert(doc.films.size === expected.size)
  }

  test("personDocs oracle face matches the typed face") {
    val typed = DocumentOps.personDocuments(spark, sf).collect()
      .map(d => d.id -> d.films.map(f => s"${f.film_id}:${f.role}").sorted.mkString(";"))
      .toMap
    DocumentOps.personDocs(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("films_flat") === typed(r.getAs[Long]("id")))
    }
  }
}
