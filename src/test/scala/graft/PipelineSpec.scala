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

  test("shardManifest: accounting reconciles to the corpus; checksum is order-independent and change-sensitive") {
    import graft.ops.PipelineOps
    val out = PipelineOps.shardManifest(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "text").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    def h60(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val bySource = docs.groupBy(_.getAs[String]("source"))
    out.foreach { r =>
      val g = bySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === g.length.toLong)
      assert(r.getAs[Long]("min_id") === g.map(_.getAs[Long]("doc_id")).min)
      assert(r.getAs[Long]("max_id") === g.map(_.getAs[Long]("doc_id")).max)
      assert(r.getAs[Long]("bytes") ===
        g.map(_.getAs[String]("text").getBytes("UTF-8").length.toLong).sum)
      // XOR fold replayed locally in ANY order = the engine's checksum;
      // flipping one doc's text flips the checksum
      val xs = g.map(x => h60(x.getAs[String]("text")))
      assert(r.getAs[Long]("checksum") === xs.reduce(_ ^ _))
      assert(r.getAs[Long]("checksum") !==
        (xs.tail :+ h60(xs.head.toString + "!")).reduce(_ ^ _))
    }
  }
}
