package graft

import graft.ops.DocumentOps
import org.apache.spark.sql.functions._

class DocumentSpec extends SparkSpecBase {

  test("orderDocuments: nested lines match the source rows for a sampled order") {
    val docs = DocumentOps.orderDocuments(spark, sf)
    // pick an order with several lines
    val sampleKey = Tables.lineitem(spark, sf).groupBy("l_orderkey").count()
      .orderBy(desc("count"), asc("l_orderkey")).head.getAs[Long]("l_orderkey")
    val doc = docs.filter(col("id") === sampleKey).head()
    val srcLines = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === sampleKey)
      .select("l_linenumber", "l_partkey", "l_returnflag").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(doc.lines.map(l => (l.line_no, l.part_id, l.flag)).toSet === srcLines)
    assert(doc.n_lines === srcLines.size)
    // returned_part_names only lists R-flagged lines' parts
    val rParts = doc.lines.filter(l => l.flag == "R" || l.flag == "r")
      .map(_.part_name).distinct.sorted
    val got = if (doc.returned_part_names.isEmpty) Seq.empty
              else doc.returned_part_names.split(",").toSeq
    assert(got.sorted === rParts)
  }

  test("orderDocuments: order with no lines gets empty array, not null (F2)") {
    import spark.implicits._
    // synthesize: an order key absent from lineitem
    val docs = DocumentOps.orderDocuments(spark, sf).collect()
    val lineKeys = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().as[Long].collect().toSet
    val orphan = docs.filter(d => !lineKeys(d.id))
    // TPC-H-ish generators usually cover all orders; only assert when present
    orphan.foreach { d =>
      assert(d.lines.isEmpty && d.n_lines === 0 && d.returned_part_names === "")
    }
    // and the arrays are never null on any doc
    assert(docs.forall(_.lines != null))
  }

  test("docsAsJson: valid JSON per doc, id round-trips") {
    val js = DocumentOps.docsAsJson(spark, sf).limit(50).collect()
    js.foreach { r =>
      val id = r.getAs[Long]("id")
      val doc = r.getAs[String]("doc")
      assert(doc.startsWith("{") && doc.contains(s""""id":$id"""))
      // nested array serialized as JSON array
      assert(doc.contains(""""lines":["""") || doc.contains(""""lines":[]""") ||
             doc.contains(""""lines":[{"""))
    }
  }
}
