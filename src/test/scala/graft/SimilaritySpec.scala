package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {

  test("cosineTopK: query vector ranks itself first with cos ≈ 1") {
    val top = SimilarityOps.cosineTopK(spark, sf).collect()
    assert(top.length === 10)
    assert(top.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("annLsh: subset of corpus, contains the query itself, recall > 0 vs brute force") {
    val ann = SimilarityOps.annLsh(spark, sf).collect()
    assert(ann.nonEmpty)
    assert(ann.head.getAs[Long]("vec_id") === 0L) // hamming(q,q)=0 ⇒ always probed
    val brute = SimilarityOps.cosineTopK(spark, sf).collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = ann.count(r => brute(r.getAs[Long]("vec_id"))).toDouble / brute.size
    assert(recall > 0.0) // random-hyperplane LSH with 12 planes, multi-probe r=1
  }

  test("sigDriver: bit-identical to the in-plan lsh_sig expression over the corpus") {
    // the literal-probe plan only works if the driver-computed query sig
    // lands in the same bucket the corpus-side expression assigns — assert
    // equality over EVERY corpus vector, not just the default query
    val rows = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        SimilarityOps.lshSignature(col("embedding").cast("array<double>"), 12).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      assert(SimilarityOps.sigDriver(v, 12) === r.getAs[Long]("sig"),
        s"vec_id=${r.getLong(0)}")
    }
  }

  test("annIvfServed ≡ annIvf: the partitioned store changes the read path, never the answer") {
    val inline = SimilarityOps.annIvf(spark, sf).collect().map(_.toSeq).toSeq
    val served = SimilarityOps.annIvfServed(spark, sf).collect().map(_.toSeq).toSeq
    assert(inline.nonEmpty && served === inline)
  }

  test("annIvf: probes its own cell (query self-hit), results are a corpus subset") {
    val ivf = SimilarityOps.annIvf(spark, sf).collect()
    assert(ivf.nonEmpty && ivf.length <= 10)
    // the query's cell is always probed (it is its own nearest-cell member)
    assert(ivf.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(ivf.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = ivf.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("annIvf: every returned vector lives in one of the nprobe probed cells") {
    // recall sanity vs brute force: at least the self-hit overlaps; with 16
    // cells over 50 vectors (sf0.001) the 2-cell probe covers a real fraction
    val brute = SimilarityOps.cosineTopK(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivf = SimilarityOps.annIvf(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(ivf.intersect(brute).nonEmpty)
  }

  test("semDedup: planted duplicate clusters resolve to min-id representatives") {
    import spark.implicits._
    // two planted clusters on disjoint support (cosine across clusters = 0,
    // so no threshold-crossing edge can merge them even if buckets collide);
    // 20/21 are an antipodal pair (cos = −1 ⇒ never an edge) and band apart
    val a = Array.tabulate(64)(i => if (i < 32) ((i * 7) % 5 - 2).toFloat else 0f)
    val b = Array.tabulate(64)(i => if (i >= 32) ((i * 5) % 7 - 3).toFloat else 0f)
    val c = a.map(-_)
    Seq((0L, a.toSeq, 0), (1L, a.toSeq, 0), (2L, a.toSeq, 0),
        (10L, b.toSeq, 1), (11L, b.toSeq, 1),
        (20L, c.toSeq, 2), (21L, a.toSeq, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet("/tmp/graft_semdedup/embeddings.parquet")
    val out = SimilarityOps.semDedup(spark, "/tmp/graft_semdedup").collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    // cluster {0,1,2,21} (21 duplicates vector a) and cluster {10,11}
    assert(out.keySet === Set(0L, 1L, 2L, 10L, 11L, 21L)) // 20 is unclustered
    Seq(0L, 1L, 2L, 21L).foreach { id =>
      assert(out(id).getAs[Long]("cluster_id") === 0L)
      assert(out(id).getAs[Long]("cluster_size") === 4L)
      assert(out(id).getAs[Boolean]("kept") === (id == 0L))
    }
    Seq(10L, 11L).foreach { id =>
      assert(out(id).getAs[Long]("cluster_id") === 10L)
      assert(out(id).getAs[Long]("cluster_size") === 2L)
      assert(out(id).getAs[Boolean]("kept") === (id == 10L))
    }
  }

  test("ivfTrain: full codebook emitted, memberships reconcile, training moves centroids") {
    val out = SimilarityOps.ivfTrain(spark, sf).collect()
    assert(out.length === 16 * 64)
    // every vector lands in exactly one cell each round
    val corpus = Tables.embeddings(spark, sf).count()
    val byCell = out.filter(_.getAs[Int]("dim") === 1)
      .map(r => r.getAs[Int]("cid") -> r.getAs[Long]("n_members")).toMap
    assert(byCell.values.sum === corpus)
    // training moved at least one centroid off its init vector
    val init = SimilarityOps.collectCodebook(
      Tables.embeddings(spark, sf).withColumn("v",
        org.apache.spark.sql.functions.col("embedding").cast("array<double>")), 16)
      .map { case (c, v) => c -> v }.toMap
    val trained = out.groupBy(_.getAs[Int]("cid")).map { case (c, rs) =>
      c -> rs.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("val")) }
    assert((0 until 16).exists(c => !java.util.Arrays.equals(trained(c).toArray, init(c))),
      "two Lloyd rounds left every centroid exactly at its init vector")
    // deterministic end to end (fixed-point sums, no rand): bit-identical rerun
    val again = SimilarityOps.ivfTrain(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("annIvfTrained: serves from the TRAINED codebook, self-hit first, ordered") {
    val out = SimilarityOps.annIvfTrained(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    // the query is its own nearest neighbor and its cell is always probed
    assert(out.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(out.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = out.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // the serving codebook is trainCodebook's output, which ivfTrain's spec
    // proves differs from the stand-in init — cross-check the two probes
    // still agree on the self-hit but are allowed to differ on the tail
    val standIn = SimilarityOps.annIvf(spark, sf).collect()
    assert(standIn.head.getAs[Long]("vec_id") === 0L)
    // deterministic end to end: bit-identical rerun (trained floats included)
    val again = SimilarityOps.annIvfTrained(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("annPq: trained subquantizers, full-rank ADC shortlist, exact re-rank, deterministic") {
    val out = SimilarityOps.annPq(spark, sf).collect()
    assert(out.length === 10)
    // the query's own codes reconstruct it best-in-class: its ADC score is
    // the per-subspace maximum of its own cells, so it survives the
    // shortlist, and the exact re-rank then puts cos(q,q)=1 first
    assert(out.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(out.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = out.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // recall@10 vs the brute-force baseline: the 50-deep ADC shortlist over
    // this corpus must recover most of the true top-10 (deterministic for
    // the fixed dataset — this pins the compression quality, not luck)
    val brute = SimilarityOps.cosineTopK(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = out.count(r => brute(r.getAs[Long]("vec_id"))).toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall@10 fell to $recall")
    // bit-identical rerun, trained floats included
    val again = SimilarityOps.annPq(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("trainPqCodebooks: m codebooks of ksub centroids, training moves them off the seed") {
    val cbs = SimilarityOps.trainPqCodebooks(spark, sf)
    assert(cbs.length === 4)
    assert(cbs.forall(_.length === 16))
    assert(cbs.forall(_.forall(_.length === 16)))
    // after two Lloyd rounds at least one subspace centroid moved off its
    // seed slice (identical would mean the update never ran)
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").cast("array<double>").as("v"))
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    val moved = (0 until 4).exists { i =>
      (0 until 16).exists { c =>
        val s = seed(c).slice(i * 16, (i + 1) * 16)
        !java.util.Arrays.equals(cbs(i)(c), s)
      }
    }
    assert(moved)
  }

  test("annIvfPq: cell prune composes with the code scan; self-hit first; deterministic") {
    val out = SimilarityOps.annIvfPq(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    // the query's own cell ranks first among its probes, its own codes
    // reconstruct it best-in-class, and the exact re-rank puts cos=1 first
    assert(out.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(out.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = out.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // the cell prune can only SHRINK the PQ candidate set: every IVFPQ hit
    // must also rank at least as well in the unpruned PQ scan's universe —
    // check hits are a subset of the corpus that full-PQ could also score
    // (weak by construction) and that overlap with brute force is nonempty
    val brute = SimilarityOps.cosineTopK(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(out.map(_.getAs[Long]("vec_id")).toSet.intersect(brute).nonEmpty)
    val again = SimilarityOps.annIvfPq(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("annIvfPq: served store is bit-identical to the inline train-then-probe composition") {
    // the serving contract behind the r12 store: the model + raw vectors
    // round-trip parquet doubles EXACTLY, so a query served from the
    // version-keyed store equals the from-scratch composition row-for-row
    // (same ivf_assign, same ADC left-fold, same tie-breaks) — and the
    // oracle (which replays training inline in SQL) stays valid unchanged
    val served = SimilarityOps.annIvfPq(spark, sf).collect()
    val inline = SimilarityOps.annIvfPqInline(spark, sf).collect()
    assert(served.map(_.toString).sameElements(inline.map(_.toString)))
    // non-default serving knobs hit the same store, still bit-identical
    val s2 = SimilarityOps.annIvfPq(spark, sf, nprobe = 2, shortlist = 30).collect()
    val i2 = SimilarityOps.annIvfPqInline(spark, sf, nprobe = 2, shortlist = 30).collect()
    assert(s2.map(_.toString).sameElements(i2.map(_.toString)))
  }

  // ---- recall sweeps (sf0.01 = the driver's correctness scale: 500 vectors,
  // 16 cells — large enough that pruning is real). Ground truth is
  // cosineTopK; every number below is DETERMINISTIC (fixed data, fixed-point
  // Lloyd training, literal-seeded hyperplanes), so these pin measured
  // serving quality, not luck. Measured 2026-08-13 on sf0.01:
  //   annIvf        nprobe 1,2,4,8,16 → 0.9, 1.0, 1.0, 1.0, 1.0
  //   annIvfTrained nprobe 1,2,4,8,16 → 0.7, 0.9, 0.9, 1.0, 1.0
  //   annIvfPq (shortlist=25·nprobe)  → 0.7, 0.9, 0.9, 1.0, 1.0
  //   annPq ksub=16, shortlist 12,25,50,100 → 0.3, 0.4, 0.6, 0.8
  // Negative control, also measured: with the shortlist FIXED at 50, IVFPQ
  // recall peaks at nprobe=2 (0.9) and FALLS to 0.6 by nprobe=16 — more
  // probed cells flood the fixed-depth ADC shortlist and crowd out true
  // neighbors. The serving rule this suite pins: scale the re-rank depth
  // with the probe width. (recall-vs-ksub is NOT monotone on this corpus —
  // ksub 4,8,16 at shortlist=25 → 0.6, 0.6, 0.4 — so the PQ knob asserted
  // here is the re-rank depth, the knob a deployment actually turns.)

  private val sf01 = "/root/testdata/sf0.01"
  private lazy val brute01: Set[Long] =
    SimilarityOps.cosineTopK(spark, sf01).collect().map(_.getAs[Long]("vec_id")).toSet
  private def recall01(df: org.apache.spark.sql.DataFrame): Double =
    df.collect().map(_.getAs[Long]("vec_id")).count(brute01).toDouble / brute01.size

  test("recall sweep: annIvf and annIvfTrained improve monotonically in nprobe, to 1.0 at full probe") {
    for (ann <- Seq(
        (np: Int) => SimilarityOps.annIvf(spark, sf01, nprobe = np),
        (np: Int) => SimilarityOps.annIvfTrained(spark, sf01, nprobe = np))) {
      val recalls = Seq(1, 2, 4, 8, 16).map(np => recall01(ann(np)))
      assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
        s"recall not monotone in nprobe: $recalls")
      assert(recalls.head >= 0.5, s"single-cell probe recall collapsed: $recalls")
      // nprobe = nlist probes every cell — the prune is gone, so serving
      // MUST equal brute force exactly, not approximately
      assert(recalls.last === 1.0, s"full probe must be exhaustive: $recalls")
    }
  }

  test("recall sweep: annIvfPq with re-rank depth scaled to probe width is monotone to 1.0") {
    val recalls = Seq(1, 2, 4, 8, 16).map(np =>
      recall01(SimilarityOps.annIvfPq(spark, sf01, nprobe = np, shortlist = 25 * np)))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in (nprobe, shortlist): $recalls")
    assert(recalls.last === 1.0,
      s"full probe + 400-deep exact re-rank recovered the whole true top-10 when measured; regression: $recalls")
  }

  test("recall sweep: annPq recall is monotone in re-rank depth, ≥0.8 at shortlist=100") {
    val recalls = Seq(12, 25, 50, 100).map(sl =>
      recall01(SimilarityOps.annPq(spark, sf01, shortlist = sl)))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in shortlist: $recalls")
    assert(recalls.last >= 0.8, s"PQ recall@10 at shortlist=100 fell: $recalls")
  }

  test("annIvfTrained: Lloyd job floor pinned — train+serve in a bounded number of Spark jobs") {
    // q_ann_ivf_trained's remaining gap to DuckDB at bench scale is the
    // per-JOB dispatch floor of an inherently multi-job flow, not data
    // work: every Lloyd round is a model-sync barrier (the driver must see
    // the round's cell sums before the next assignment can be planned), so
    // rounds=2 costs exactly 2 round jobs + 1 seed collect + 1 probe = 4
    // compute jobs. Listener-measured at sf0.1 (2026-08-13): 5 jobs cold
    // (one parquet footer read before the schema cache warms), 4 warm;
    // cached-frame variant measured 6 (materialize + release for zero
    // reuse — reverted). This pin fails if a per-round job leaks back in
    // (eager materialization, probe-side broadcast build, AQE stage jobs).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def settle(): Int = {
      var prev = -1; var cur = jobs.get(); var i = 0
      while (cur != prev && i < 50) { Thread.sleep(100); prev = cur; cur = jobs.get(); i += 1 }
      cur
    }
    // AQE off outside the Lloyd loop too (the op scopes it off only around
    // training): adaptive execution materializes query stages as extra
    // jobs and would swamp the floor signal
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      SimilarityOps.annIvfTrained(spark, sf01).collect()
      val n = settle()
      assert(n <= 5, s"annIvfTrained ran $n Spark jobs — the train+serve " +
        "budget (seed collect, one job per Lloyd round, one probe, at most " +
        "one cold footer read) regressed")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("recall sweep: annSq8 recall is monotone in re-rank depth; ≥0.9 at shortlist=100") {
    // SQ8 distortion is far below PQ's (8 bits per DIM vs per subspace):
    // the decoded ADC order is near-exact, so recall should sit above the
    // PQ curve at every depth. Measured 2026-08-14 on sf0.01:
    // shortlist 12, 25, 50, 100 → 1.0, 1.0, 1.0, 1.0 (the 12-deep ADC
    // shortlist already contains the whole true top-10).
    val recalls = Seq(12, 25, 50, 100).map(sl =>
      recall01(SimilarityOps.annSq8(spark, sf01, shortlist = sl)))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in shortlist: $recalls")
    assert(recalls.last >= 0.9, s"SQ8 recall@10 at shortlist=100 fell: $recalls")
    // and strictly at-or-above PQ at the shallowest depth (the low-
    // distortion claim, measured 1.0 vs 0.3)
    val pqShallow = recall01(SimilarityOps.annPq(spark, sf01, shortlist = 12))
    assert(recalls.head >= pqShallow,
      s"SQ8@12 (${recalls.head}) under PQ@12 ($pqShallow)")
  }

  test("knnJoin: every query gets exactly k ranked neighbors, never itself, rank order = cosine order") {
    val out = SimilarityOps.knnJoin(spark, sf01, nQueries = 4, k = 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q row count")
      assert(!rows.exists(_.getAs[Long]("vec_id") == q), s"query $q matched itself")
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      val sims = ranked.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $q cosine not descending in rank: ${sims.toSeq}")
    }
    // the rank-1 neighbor of query 0 IS the brute top non-self hit
    val brute = SimilarityOps.cosineTopK(spark, sf01).collect()
      .map(_.getAs[Long]("vec_id")).filter(_ != 0L)
    val top = out.filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Long]("rank") == 1L)
    assert(top.head.getAs[Long]("vec_id") === brute.head)
  }

  test("knnJoinIvf: per-query recall vs the brute join; full probe = exact") {
    // the scale face prunes to nprobe/nlist of the corpus per query; at
    // full probe the prune is gone and it MUST equal the brute join row
    // for row (same scoring, same tie-breaks)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    val brute = asMap(SimilarityOps.knnJoin(spark, sf01, nQueries = 4, k = 5))
    val full = asMap(SimilarityOps.knnJoinIvf(spark, sf01, nQueries = 4,
      nprobe = 16, k = 5))
    assert(full === brute, "full probe must reproduce the brute join exactly")
    // partial probe: bounded loss, measured 2026-08-14 at nprobe=4 on
    // sf0.01: 18/20 of the brute neighbor set survives (0.9)
    val part = SimilarityOps.knnJoinIvf(spark, sf01, nQueries = 4,
      nprobe = 4, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val bruteSet = brute.map { case ((q, _), v) => (q, v) }.toSet
    val recall = part.count(bruteSet).toDouble / bruteSet.size
    assert(recall >= 0.7, s"knnJoinIvf nprobe=4 recall fell to $recall")
  }

  test("annMrl: exact at full shortlist, recall monotone in shortlist, sane at defaults") {
    val brute = SimilarityOps.cosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
    val n = Tables.embeddings(spark, sf).count().toInt
    // shortlist = corpus ⇒ the exact re-rank sees everything: row-for-row
    // identical to the brute top-k, scores included
    val full = SimilarityOps.annMrl(spark, sf, dPrefix = 16, shortlist = n)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
    assert(full.toSeq === brute.toSeq)
    // recall is monotone in shortlist: a larger shortlist is a SUPERSET of
    // a smaller one (same prefix ranking), so the exact re-rank can only
    // gain candidates
    val bruteIds = brute.map(_._1).toSet
    def recall(shortlist: Int): Double =
      SimilarityOps.annMrl(spark, sf, dPrefix = 16, shortlist = shortlist)
        .collect().map(_.getAs[Long]("vec_id")).count(bruteIds) / 10.0
    val r25 = recall(25); val r50 = recall(50); val r200 = recall(200)
    assert(r25 <= r50 && r50 <= r200, s"recall not monotone: $r25 $r50 $r200")
    // defaults on UNTRAINED (non-matryoshka) embeddings: the prefix is a
    // lossy projection, not a privileged slice — measured 0.5 on this
    // corpus 2026-08-14; pin a loose floor well above the ~0.1 random-
    // shortlist baseline
    assert(r50 >= 0.3, s"default-parameter recall fell to $r50")
  }

  test("protoScore: ranks tile each cell 1..n; rank order follows centroid cosine; assignment matches ivf_assign") {
    val out = SimilarityOps.protoScore(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Double]("proto_sim"),
        r.getAs[Long]("proto_rank")))
    assert(out.length === out.map(_._1).distinct.length, "one row per vector")
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to rows.length).toSeq,
        s"cell $cell ranks must tile 1..n")
      // rank order is non-increasing in the (rounded) centroid cosine
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3 - 1e-6,
          s"cell $cell rank ${b._4} outranks a lower cosine")
        case _ =>
      }
    }
  }

  test("indexStats: counts reconcile to the corpus, shares to ~1, imbalance >= 1 in fixed point") {
    val out = SimilarityOps.indexStats(spark, sf01).collect()
    val n = graft.Tables.embeddings(spark, sf01).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === n)
    val shareSum = out.map(_.getAs[Long]("share_fp")).sum
    assert(math.abs(shareSum - 1048576L) <= out.length,
      s"cell shares must sum to ~2^20, got $shareSum")
    // Cauchy–Schwarz floor: nlist·Σn²/N² >= 1 exactly at perfect balance
    val imb = out.map(_.getAs[Long]("imbalance_fp")).distinct
    assert(imb.length === 1, "imbalance is a corpus-wide constant")
    assert(imb.head >= 1048576L)
  }

  test("clusterTopics: ranks tile 1..k per cell; n_docs reconcile; a corpus-uniform token scores 0") {
    val out = SimilarityOps.clusterTopics(spark, sf01).collect()
    assert(out.nonEmpty)
    // ranks tile 1..k within every cell, ordered by (score desc, token asc)
    out.groupBy(_.getAs[Long]("cell")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to sorted.length))
      val keys = sorted.map(r => (-r.getAs[Long]("score_fp"), r.getAs[String]("token")))
      assert(keys.sorted.toSeq === keys.toSeq)
    }
    // per-cell doc counts reconcile to the embedded-corpus size
    val nDocsByCell = out.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_docs")).toMap
    assert(nDocsByCell.values.sum > 0)
    assert(nDocsByCell.values.sum <= graft.Tables.embeddings(spark, sf01).count()
      * nDocsByCell.size, "sanity bound")
    // JLH zero-law: fg% = bg% ⇒ score exactly 0 — a token in EVERY cell's
    // every doc would score 0; verify via the arithmetic on a planted case
    // (the oracle gates the full corpus; this pins the seam arithmetic)
    import spark.implicits._
    val docs = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"))
      .toDF("doc_id", "source")
    val postings = Seq((0L, "every", 1L), (1L, "every", 1L),
      (2L, "every", 1L), (3L, "every", 1L), (0L, "only", 1L), (1L, "only", 1L))
      .toDF("doc_id", "token", "tf")
    val st = graft.ops.SearchOps.significantTermsOn(postings, docs, "A")
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("score_fp")).toMap
    assert(st("every") === 0L)
    // "only": fg% = 1, bg% = 1/2 → (1 − 1/2)·(1 ÷ 1/2) = 1.0 exactly
    assert(st("only") === 1048576L)
  }

  test("hardNegatives: no negative shares the anchor's near-dup family; ranks tile per anchor") {
    val out = graft.ops.SimilarityOps.hardNegatives(spark, sf).collect()
    assert(out.nonEmpty)
    val fam = graft.ops.DedupOps.servedDupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def key(id: Long): Long = fam.getOrElse(id, id)
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rows.length))
      rows.foreach { r =>
        val neg = r.getAs[Long]("neg_id")
        assert(neg !== q)
        assert(key(neg) !== key(q),
          s"negative $neg shares anchor $q's near-dup family — false negative")
      }
    }
  }

  test("cosine expression: hand-checked value on unit vectors") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("retrievalEval: full probe is a perfect scorecard; defaults stay within bounds") {
    val full = graft.ops.SimilarityOps.retrievalEval(spark, sf, nlist = 16, nprobe = 16)
      .collect()
    assert(full.length === 8)
    full.foreach { r =>
      assert(r.getAs[Long]("n_hits") === 5L)
      assert(r.getAs[Long]("first_rank") === 1L)
      assert(r.getAs[Long]("rr_fp") === 1048576L)
      assert(r.getAs[Long]("recall_fp") === 1048576L)
    }
    val dflt = graft.ops.SimilarityOps.retrievalEval(spark, sf).collect()
    assert(dflt.length === 8)
    dflt.foreach { r =>
      val (h, fr, rr, rec) = (r.getAs[Long]("n_hits"), r.getAs[Long]("first_rank"),
        r.getAs[Long]("rr_fp"), r.getAs[Long]("recall_fp"))
      assert(h >= 0L && h <= 5L)
      assert(rec === (1048576L * h) / 5)
      if (h > 0) assert(rr === 1048576L / fr) else assert(rr === 0L && fr === 0L)
    }
  }

  test("embedSanity: clean corpus all-keep; planted NaN / zero / blown-up vectors flagged") {
    val real = graft.ops.SimilarityOps.embedSanity(spark, sf).collect()
    assert(real.nonEmpty)
    assert(real.forall(_.getAs[Boolean]("keep")), "synthetic embeddings are all sane")
    // planted pathologies through a temp dir
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sanity").toString
    Seq(
      (0L, Seq(1.0f, 0.0f), 7),            // sane
      (1L, Seq(Float.NaN, 1.0f), 7),       // NaN component
      (2L, Seq(0.0f, 0.0f), 7),            // zero norm
      (3L, Seq(1e6f, 1e6f), 7))            // blown-up norm
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.SimilarityOps.embedSanity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Boolean]("has_nan"), r.getAs[Boolean]("keep"))).toMap
    assert(got(0L) === ((false, true)))
    assert(got(1L) === ((true, false)))
    assert(got(2L) === ((false, false)))
    assert(got(3L) === ((false, false)))
  }

  test("annIvfFilteredAdaptive: full escalation equals the brute filtered ranking; early stop fills k consistently") {
    import org.apache.spark.sql.functions._
    // brute filtered ranking: cosine of every label-3 vector to vec 0
    val brute = SimilarityOps.cosineTopK(spark, sf, 0L, Int.MaxValue)
      .filter(col("label") === 3L)
      .collect().map(_.getLong(0))
    assert(brute.length > 10, "fixture needs more than k label-3 vectors")
    // k beyond the label's population forces escalation to the full probe:
    // the result IS the brute filtered ranking, in order
    val full = SimilarityOps.annIvfFilteredAdaptive(spark, sf, k = 100000)
      .collect().map(_.getLong(0))
    assert(full.toSeq === brute.toSeq)
    // default k: exactly k rows, ordered consistently with the brute rank
    val k10 = SimilarityOps.annIvfFilteredAdaptive(spark, sf).collect().map(_.getLong(0))
    assert(k10.length === 10)
    val pos = brute.zipWithIndex.toMap
    val ranks = k10.map(pos)
    assert(ranks.toSeq === ranks.sorted.toSeq, "early-stop results must respect the global order")
  }
}
