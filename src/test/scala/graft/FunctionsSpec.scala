package graft

import graft.functions.{GraftFunctions, MinHashSlots}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def composed(hashes: org.apache.spark.sql.Column, k: Int) =
    graft.ops.DedupOps.fastSignature(hashes, k)

  test("minhash_slots ≡ composed array_min(transform(affine-mod-p)) — bit-identical") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val df = (1 to 200).map(i => (i.toLong, Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong())))
      .toDF("id", "hashes")
    val both = df.select(col("id"),
        expr("minhash_slots(hashes, 8)").as("native"),
        composed(col("hashes"), 8).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
  }

  test("minhash_slots edge cases: empty array → null slots; null input → null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, None),
      (3L, Some(Seq(42L)))).toDF("id", "hashes")
    val out = df.select(col("id"), expr("minhash_slots(hashes, 4)").as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    assert(out(1L) === Seq(null, null, null, null)) // matches array_min(empty) = null
    assert(out(2L) === null)
    assert(out(3L).forall(_ != null))
  }

  test("minhash_slots agrees under interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val df = (1 to 50).map(i => (i.toLong, Seq.fill(20)(i.toLong * 31 + 7))).toDF("id", "hashes")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(expr("minhash_slots(hashes, 8)")).collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("simhash64 ≡ composed 64-fold bit-vote form — bit-identical") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val df = (1 to 200).map(i => (i.toLong, Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong())))
      .toDF("id", "hashes")
    val both = df.select(col("id"),
        expr("simhash64(hashes)").as("native"),
        graft.ops.DedupOps.simhashComposed(col("hashes")).as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getLong(0)}"))
  }

  test("simhash64 agrees under interpreted and codegen paths; empty → 0") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Seq(5L, 9L, 5L)), (2L, Seq.empty[Long])).toDF("id", "hashes")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(expr("simhash64(hashes)")).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val a = run("CODEGEN_ONLY"); val b = run("NO_CODEGEN")
    assert(a === b)
    assert(a(1) === 0L)
  }

  test("minhash_slots survives dup detection end-to-end (same text ⇒ same sig)") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "identical shingle text"), (2L, "identical shingle text"),
                 (3L, "something entirely different here"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_fn_docs/documents.parquet")
    val pairs = graft.ops.DedupOps.minhashPairs(spark, "/tmp/graft_fn_docs").collect()
    assert(pairs.exists(r => r.getAs[Long]("left_id") == 1L &&
      r.getAs[Long]("right_id") == 2L && r.getAs[Double]("est_jaccard") == 1.0))
  }
}
