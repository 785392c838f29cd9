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

  test("LSH band join under boilerplate skew: census guard bounds pairs, no straggler task") {
    // the 100 TB nightmare corpus: one boilerplate family far over the
    // bucket cap (would be C(1000,2) ≈ 500k pairs unguarded), one family
    // exactly AT the cap, one genuine near-dup pair
    val dir = "/tmp/graft_skew_docs"
    val boiler = (1L to 1000L).map((_, "the same boilerplate disclaimer text repeated on every page"))
    val atCap  = (2001L to 2064L).map((_, "an identical template family sized exactly at the bucket cap"))
    val planted = Seq((3001L, "a genuinely unique document about rivers and mountains"),
                      (3002L, "a genuinely unique document about rivers and mountains"))
    (boiler ++ atCap ++ planted).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")

    // straggler watch: the unguarded blowup lands in the pair join's
    // downstream shuffle (dropDuplicates over ~500k pair rows → one ~250k-
    // record task); guarded, the largest shuffle read is the census itself
    // (~4k band rows of the hot family)
    val maxShuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          maxShuffleRead.updateAndGet(x => math.max(x, m.shuffleReadMetrics.recordsRead))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val rows =
      try {
        val (d, pairs) = DedupOps.bandedCandidatePairs(spark, "/tmp/graft_skew_docs", maxBucket = 64)
        val out = pairs.collect()
        d.unpersist()
        // listener events are async; the pair pipeline ALWAYS shuffles
        // (bands → census → join), so first wait for a nonzero metric —
        // exiting on "stable at 0" would pass the straggler assertion
        // vacuously when events drain slowly — then for stability
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (maxShuffleRead.get() == 0 && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(maxShuffleRead.get() > 0,
          "no shuffle-read metrics observed within 15s — listener wiring broken")
        var prev = -1L
        var spins = 0
        while (prev != maxShuffleRead.get() && spins < 20) {
          prev = maxShuffleRead.get(); Thread.sleep(250); spins += 1
        }
        out
      } finally spark.sparkContext.removeSparkListener(listener)

    def inFam(r: org.apache.spark.sql.Row, lo: Long, hi: Long) =
      r.getLong(0) >= lo && r.getLong(0) <= hi
    // over-cap family: dropped by the census BEFORE the join — zero pairs
    assert(!rows.exists(inFam(_, 1L, 1000L)),
      "boilerplate family over maxBucket must produce no candidate pairs")
    // at-cap family: exactly C(64,2) — the per-bucket ceiling is tight
    assert(rows.count(inFam(_, 2001L, 2064L)) === 64 * 63 / 2)
    // the guard must not eat real signal: the planted near-dup pair survives
    assert(rows.exists(r => r.getLong(0) === 3001L && r.getLong(1) === 3002L &&
      r.getAs[Double]("est_jaccard") === 1.0))
    assert(rows.length === 64 * 63 / 2 + 1) // nothing else joins
    assert(maxShuffleRead.get() < 10000,
      s"straggler task: max shuffle-read ${maxShuffleRead.get()} records " +
      "(unguarded boilerplate blowup reads ~250k)")
  }

  test("containmentPairs: finds the low-Jaccard sub-document copy that LSH-Jaccard blocking misses") {
    import spark.implicits._
    // doc 1 is pasted verbatim inside doc 2 (which is ~7x larger): Jaccard
    // ~0.14 — under ngramJaccard's 0.2 floor AND unlikely to band-collide —
    // but containment(1 in 2) is exactly 1.0
    val small = (1 to 10).map(i => s"needle$i").mkString(" ")
    val bigPad = (1 to 60).map(i => s"hay$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$bigPad $small"),
      (3L, (1 to 40).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.DedupOps.containmentPairsOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("contain_l"), r.getAs[Double]("contain_r"))).toMap
    // output columns are (left_id, right_id) — compared as a Set anyway
    val pair = out.keySet.find(p => Set(p._1, p._2) == Set(1L, 2L))
    assert(pair.isDefined, s"sub-document copy not detected: ${out.keySet}")
    val (cl, cr) = out(pair.get)
    assert(math.max(cl, cr) === 1.0, "the smaller side must be fully contained")
    assert(math.min(cl, cr) < 0.2, "and the Jaccard-like symmetric view stays low")
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs: boilerplate-saturated grams are excluded by the df guard") {
    import spark.implicits._
    // 30 docs all sharing one boilerplate sentence (df=30 > dfCap=16) and
    // otherwise unique text: the guard must yield NO pairs — ubiquitous
    // grams are not copy evidence
    val boiler = "all rights reserved by the site"
    val docs = (1L to 30L).map(i =>
      (i, s"$boiler unique$i wording$i here$i now$i"))
      .toDF("doc_id", "text")
    assert(graft.ops.DedupOps.containmentPairsOn(docs).collect().isEmpty)
  }

  test("winnow: density bounds, the shared-substring guarantee, and edit robustness") {
    import spark.implicits._
    val k = 4; val w = 4
    val shared = "alpha bravo charlie delta echo foxtrot golf" // k+w-1 = 7 tokens
    val docs = Seq(
      (1L, s"one two three $shared nine ten eleven twelve"),
      (2L, s"red green blue yellow purple $shared umber"), // same run, shifted
      (3L, "totally different words with no overlap at all here"),
      (4L, "tiny doc"), // < k tokens → empty fingerprint
      (5L, "five token doc right here")) // 5 tokens → 2 grams < w → one window
      .toDF("doc_id", "text")
    val out = graft.ops.DedupOps.winnowCore(docs, k, w).collect()
      .map { r =>
        val gs = r.getSeq[Long](1); val pos = r.getSeq[Long](2)
        r.getLong(0) -> (gs, pos, pos.map(p => gs(p.toInt - 1)).toSet)
      }.toMap
    // density: every w-window yields >= 1 selection and <= all windows
    for ((id, (gs, pos, _)) <- out if gs.nonEmpty) {
      val nWin = math.max(gs.length - w + 1, 1)
      assert(pos.length >= math.ceil(nWin.toDouble / w).toInt && pos.length <= nWin,
        s"doc $id: ${pos.length} selections from $nWin windows")
      assert(pos.forall(p => p >= 1 && p <= gs.length))
      assert(pos == pos.sorted && pos.distinct == pos)
    }
    // THE guarantee: docs 1 and 2 share a >= k+w-1 token run at DIFFERENT
    // offsets → at least one common selected HASH; doc 3 shares none
    assert((out(1L)._3 intersect out(2L)._3).nonEmpty,
      "shared 7-token run must contribute a common fingerprint")
    assert((out(1L)._3 intersect out(3L)._3).isEmpty)
    // sub-k doc: no grams, no fingerprint; short-but-viable doc: 2 grams,
    // one whole-array window, exactly one selection
    assert(out(4L)._1.isEmpty && out(4L)._2.isEmpty)
    assert(out(5L)._1.length === 2 && out(5L)._2.length === 1)
  }

  test("dupBest: exactly one keep per cluster, and it is the longest copy (min id on ties)") {
    val out = graft.ops.DedupOps.dupBest(spark, sf).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, rows) =>
      val kept = rows.filter(_.getAs[Boolean]("keep"))
      assert(kept.length === 1)
      val best = rows.sortBy(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id"))).head
      assert(kept.head.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"))
      assert(rows.length === rows.head.getAs[Long]("cluster_size"))
    }
  }

  test("dupRate: counts reconcile with the cluster store; rates are exact integer fixed point") {
    val out = graft.ops.DedupOps.dupRate(spark, sf).collect()
    assert(out.nonEmpty)
    val clustered = graft.ops.DedupOps.servedDupClusters(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_clustered")).sum === clustered,
      "per-source clustered counts must sum to the cluster store size")
    out.foreach { r =>
      val (n, c, d, fp) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clustered"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("drop_rate_fp"))
      assert(d <= c && c <= n)
      assert(fp === (1048576L * d) / n)
    }
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
  }

  test("splitLeakfree: every near-dup cluster lands whole on one side; cut is the hash law") {
    val out = graft.ops.DedupOps.splitLeakfree(spark, sf).collect()
    assert(out.length === Tables.documents(spark, sf).count())
    // THE invariant this operator exists for: no cluster straddles the split
    out.groupBy(_.getAs[Long]("split_key")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length === 1,
        "a duplicate family must never straddle train/val")
    }
    // the split is exactly the salted-hash law, replayable row by row
    out.foreach { r =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:${r.getAs[Long]("split_key")}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = if (h < "1a") "val" else "train"
      assert(r.getAs[String]("split") === expect)
    }
    // both sides populated at corpus scale (≈10.2% val)
    val nVal = out.count(_.getAs[String]("split") == "val")
    assert(nVal > 0 && nVal < out.length)
  }

  test("dedupEval: counts cohere, ratios replay the integer counts, estimator beats chance on the dup corpus") {
    val r = DedupOps.dedupEval(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val nPairs = row.getAs[Long]("n_pairs")
    val nTruth = row.getAs[Long]("n_truth")
    val nPred = row.getAs[Long]("n_pred")
    val nHit = row.getAs[Long]("n_hit")
    // probes × (corpus − self): the bounded broadcast shape, never corpus²
    val nAll = graft.Tables.documents(spark, sf).count()
    // same modulus law as dedupEval itself (max(20, n/25)) — a hardcoded
    // 20 silently breaks past 500 docs (r13 ADVICE)
    val modulus = math.max(20L, nAll / 25L)
    val nProbes = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(modulus)) === 3).count()
    assert(nPairs === nProbes * (nAll - 1))
    assert(nHit <= math.min(nTruth, nPred))
    assert(nTruth > 0, "the synthetic corpus carries near-dups; truth must be non-empty")
    val p = row.getAs[Double]("precision"); val rec = row.getAs[Double]("recall")
    val f1 = row.getAs[Double]("f1")
    assert(p === (if (nPred > 0) nHit.toDouble / nPred else 0.0))
    assert(rec === (if (nTruth > 0) nHit.toDouble / nTruth else 0.0))
    if (p + rec > 0) assert(math.abs(f1 - 2.0 * p * rec / (p + rec)) < 1e-12)
    // 8 slots is coarse but must beat chance decisively on this corpus
    assert(f1 > 0.5, s"estimator f1 $f1 should beat chance on the dup-heavy corpus")
  }

  test("incrementalDedup: full batch coverage, threshold/verdict coherence, batch broadcasts into the served store") {
    import graft.ops.DedupOps
    val out = DedupOps.incrementalDedup(spark, sf).collect()
    val batchIds = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(20)) === 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("batch_id")).toSet === batchIds)
    out.foreach { r =>
      val (isDup, est) = (r.getAs[Boolean]("is_dup"), r.getAs[Double]("best_est"))
      assert(isDup === (est >= 0.75))
      // estimates are exact eighths of the 8-slot signature agreement
      assert((est * 8).isWhole && est >= 0.0 && est <= 1.0)
      if (isDup) {
        val dupOf = r.getAs[Long]("dup_of")
        assert(dupOf % 20 !== 7, "dup_of must point INTO the corpus, never the batch")
      } else assert(r.isNullAt(r.fieldIndex("dup_of")))
    }
    // the fixture corpus produces BOTH verdicts — the gate discriminates
    assert(out.exists(_.getAs[Boolean]("is_dup")) && out.exists(!_.getAs[Boolean]("is_dup")))
    // asymmetric join shape: the (small) batch side broadcasts; the corpus
    // store is never rescanned per batch doc
    val plan = DedupOps.incrementalDedup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the batch bands broadcast into the store probe in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected product join in:\n$plan")
  }
}
