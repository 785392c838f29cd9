package graft

import graft.ops.{DedupOps, PipelineOps, TextOps}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpecBase {

  test("curateKept: every verdict reconciles with the three stage outputs under the fixed priority") {
    val reasons = TextOps.filterChain(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    val dups = DedupOps.dupClusters(spark, sf)
      .filter(col("doc_id") =!= col("cluster_id"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val cont = TextOps.decontaminate(spark, sf)
      .filter(col("n_contaminated_grams") >= 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val out = PipelineOps.curateKept(spark, sf).collect()
    assert(out.length === reasons.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected =
        if (reasons(id) != "kept") reasons(id)
        else if (dups(id)) "duplicate"
        else if (cont(id)) "contaminated"
        else "kept"
      assert(r.getAs[String]("verdict") === expected, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (expected == "kept"), s"doc $id")
    }
    // the gate must actually bite on the real corpus: some kept, some not
    assert(out.exists(_.getAs[Boolean]("keep")))
    assert(out.exists(!_.getAs[Boolean]("keep")))
  }
}
