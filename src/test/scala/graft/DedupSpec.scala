package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupExact: copies reconcile to table size; synthesized dups collapse") {
    val out = DedupOps.dedupExact(spark, sf)
    assert(out.select(sum("n_copies")).head.getLong(0) === Tables.documents(spark, sf).count())
    // synthesized duplicates: same text twice must group to one keeper
    val dup = Seq((10L, "same text"), (20L, "same text"), (30L, "other")).toDF("doc_id", "text")
    val g = dup.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("keeper") -> r.getAs[Long]("n")).toMap
    assert(g(10L) === 2L && g(30L) === 1L)
  }

  test("minhashSignature: deterministic across runs; equal texts ⇒ equal signatures") {
    val a = DedupOps.minhashSignature(spark, sf).orderBy("doc_id").limit(20).collect()
    val b = DedupOps.minhashSignature(spark, sf).orderBy("doc_id").limit(20).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("minhashPairs: bounded estimates, canonical pair order, near-dups surface") {
    val out = DedupOps.minhashPairs(spark, sf).collect()
    assert(out.forall { r =>
      val j = r.getAs[Double]("est_jaccard")
      j >= 0.0 && j <= 1.0 && r.getAs[Long]("left_id") < r.getAs[Long]("right_id")
    })
  }

  test("dupClusters: cluster_id is the component min; edges never straddle clusters") {
    val clusters = DedupOps.dupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(clusters.nonEmpty, "sf corpus has planted dups; clusters must exist")
    // every member's cluster_id is the min doc_id of its cluster
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
      // and size matches membership
      assert(members.head._2._2 === members.size.toLong)
    }
    // transitivity: both endpoints of every strong pair share a cluster
    DedupOps.minhashPairs(spark, sf).filter(col("est_jaccard") >= 0.5)
      .collect().foreach { r =>
        val (l, rr) = (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"))
        assert(clusters(l)._1 === clusters(rr)._1,
          s"pair ($l,$rr) must be in one cluster")
      }
  }

  test("simhash: identical token multisets get identical simhash; near texts near hash") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
                 (3L, "completely unrelated words here")).toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_test_docs/documents.parquet")
    val out = DedupOps.simhash(spark, "/tmp/graft_test_docs")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("ngramJaccard: jaccard in [0.2, 1]; symmetric-safe (left<right)") {
    val out = DedupOps.ngramJaccard(spark, sf).collect()
    assert(out.forall { r =>
      val j = r.getAs[Double]("jaccard")
      j >= 0.2 && j <= 1.0 && r.getAs[Long]("left_id") < r.getAs[Long]("right_id")
    })
  }
}
