package graft

import graft.ops.CurationOps
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {

  /** Planted corpus with controlled distributions: the `en` (target) slice
    * speaks {alpha, beta}, the `de` slice speaks {gamma, delta}, and one
    * mixed doc straddles both. Written as a documents.parquet so the
    * operators run their real load path.
    */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    Seq(
      (0L, "alpha beta alpha beta alpha", "en", "srcA"),
      (1L, "beta alpha beta alpha",       "en", "srcA"),
      (2L, "alpha beta alpha",            "en", "srcB"),
      (3L, "gamma delta gamma delta",     "de", "srcC"),
      (4L, "delta gamma delta",           "de", "srcC"),
      (5L, "alpha gamma",                 "de", "srcD"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dsirWeights: target-typical docs outscore off-target docs; mixed in between") {
    val w = CurationOps.dsirWeights(spark, plantedDir, targetLang = "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_ratio")).toMap
    assert(w.size === 6)
    // pure-target docs carry positive evidence, pure-off-target negative
    for (id <- Seq(0L, 1L, 2L)) assert(w(id) > 0, s"target doc $id: ${w(id)}")
    for (id <- Seq(3L, 4L)) assert(w(id) < 0, s"off-target doc $id: ${w(id)}")
    // the mixed doc sits strictly between the pure extremes
    assert(w(5L) > Seq(3L, 4L).map(w).max && w(5L) < Seq(0L, 1L, 2L).map(w).min)
  }

  test("dsirWeights: n_grams = 2·tokens − 1 per doc (unigrams + adjacent bigrams)") {
    val out = CurationOps.dsirWeights(spark, plantedDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_grams")).toMap
    val expected = Map(0L -> 9L, 1L -> 7L, 2L -> 5L, 3L -> 7L, 4L -> 5L, 5L -> 3L)
    assert(out === expected)
  }

  test("dsirWeights: deterministic across runs (fixed-point fold)") {
    val a = CurationOps.dsirWeights(spark, sf).orderBy("doc_id").collect()
    val b = CurationOps.dsirWeights(spark, sf).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("dsirResample: a Gumbel-top-n subset of the weights, deterministic, biased toward high weights") {
    val n = 3
    val out = CurationOps.dsirResample(spark, plantedDir, n = n).collect()
    assert(out.length === n)
    // subset of the scored docs, keys strictly ordered (desc, doc_id tiebreak)
    val w = CurationOps.dsirWeights(spark, plantedDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    out.foreach(r => assert(w(r.getAs[Long]("doc_id"))))
    val keys = out.map(r => (r.getAs[Long]("gumbel_fx"), r.getAs[Long]("doc_id")))
    assert(keys.sliding(2).forall { case Array((k1, d1), (k2, d2)) =>
      k1 > k2 || (k1 == k2 && d1 < d2) })
    // deterministic replay: the perturbation is hash-derived, not random
    val again = CurationOps.dsirResample(spark, plantedDir, n = n).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("qualityClassifier: separates the planted target slice after two GD iterations") {
    val p = CurationOps.qualityClassifier(spark, plantedDir, targetLang = "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("z_fx"), r.getAs[Double]("p_target"))).toMap
    assert(p.size === 6)
    p.values.foreach { case (_, prob) => assert(prob > 0.0 && prob < 1.0) }
    // pure-target docs (alpha/beta vocab) score above every off-target doc
    // (gamma/delta vocab); the mixed doc 5 sits between the pure extremes
    val en = Seq(0L, 1L, 2L).map(p(_)._2)
    val de = Seq(3L, 4L).map(p(_)._2)
    assert(en.min > de.max, s"en=$en de=$de")
    assert(p(5L)._2 > de.max && p(5L)._2 < en.min)
  }

  test("qualityClassifier: deterministic replay (fixed-point training)") {
    val a = CurationOps.qualityClassifier(spark, sf).orderBy("doc_id").collect()
    val b = CurationOps.qualityClassifier(spark, sf).orderBy("doc_id").collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("sourceOverlap: exact Jaccard on the planted vocabulary") {
    val out = CurationOps.sourceOverlap(spark, plantedDir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("shared"), r.getAs[Long]("v_a"), r.getAs[Long]("v_b"),
         r.getAs[Double]("jaccard"))).toMap
    // srcA vocab: {alpha, beta, alpha beta, beta alpha} = 4
    // srcB vocab: {alpha, beta, alpha beta, beta alpha} = 4 (identical)
    assert(out(("srcA", "srcB")) === ((4L, 4L, 4L, 1.0)))
    // srcC vocab: {gamma, delta, gamma delta, delta gamma} = 4 — disjoint
    // from srcA, so the pair emits no row at all (shared = 0)
    assert(!out.contains(("srcA", "srcC")))
    // srcD vocab: {alpha, gamma, alpha gamma} = 3; shares 1 with srcA
    // (alpha) and 1 with srcC (gamma): 1 / (4 + 3 - 1) = 1/6
    assert(out(("srcA", "srcD"))._1 === 1L)
    assert(math.abs(out(("srcA", "srcD"))._4 - 1.0 / 6) < 1e-6)
    assert(out(("srcC", "srcD"))._1 === 1L)
  }

  test("sourceOverlap: df guard drops saturated grams and rescales vocabularies") {
    // 'alpha' appears in 3 of 4 sources (srcA, srcB, srcD) = 75% share; a
    // 0.5 guard drops it (and nothing that is in ≤2 sources). With alpha
    // gone, srcA∩srcD = ∅ → the pair vanishes; srcA/srcB still share their
    // remaining 3 grams exactly.
    val out = CurationOps.sourceOverlap(spark, plantedDir, maxShare = 0.5).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("shared"), r.getAs[Long]("v_a"), r.getAs[Long]("v_b"))).toMap
    assert(!out.contains(("srcA", "srcD")))
    assert(out(("srcA", "srcB")) === ((3L, 3L, 3L)))
  }
}
