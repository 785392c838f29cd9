package graft

import graft.ops.RelationalOps
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {

  test("pricingSummary: groups partition the filtered rows exactly") {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val agg = RelationalOps.pricingSummary(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("count_order")).sum === li.count())
    // every group's avg_qty = sum_qty / count_order
    agg.foreach { r =>
      val avg = r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order")
      assert(math.abs(avg - r.getAs[Double]("avg_qty")) < 1e-9)
    }
  }

  test("filterProject: every output row satisfies the predicate") {
    val out = RelationalOps.filterProject(spark, sf)
    assert(out.filter(col("ship_date") < "1996-01-01" || col("ship_date") >= "1997-01-01").count() === 0)
    assert(out.count() > 0)
  }

  test("denormDocs: one row per order; line counts reconcile to lineitem") {
    val docs = RelationalOps.denormDocs(spark, sf)
    val nOrders = Tables.orders(spark, sf).count()
    assert(docs.count() === nOrders)
    assert(docs.select(sum("n_lines")).head.getLong(0) === Tables.lineitem(spark, sf).count())
    // customer enrichment: any order with a customer must carry nation+region
    assert(docs.filter(col("c_name").isNotNull && col("r_name").isNull).count() === 0)
  }

  test("filteredCollect: finished_ids only contains finished orders") {
    val out = RelationalOps.filteredCollect(spark, sf)
    val nFinished = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(out.select(sum("n_finished")).head.getLong(0) === nFinished)
    // n_finished == number of ids in the csv (set semantics; keys are unique)
    assert(out.filter(
      col("n_finished") =!= when(col("finished_ids") === "", 0)
        .otherwise(size(split(col("finished_ids"), ",")))).count() === 0)
  }

  test("topkRevenue: 20 rows, sorted desc, matches recomputed max") {
    val out = RelationalOps.topkRevenue(spark, sf).collect()
    assert(out.length === 20)
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val trueMax = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("r"))
      .select(max("r")).head.getDouble(0)
    assert(math.abs(revs.head - trueMax) < 1e-6)
  }

  test("pagination: rows 101..150 in key order, consistent with key-range seek") {
    val out = RelationalOps.pagination(spark, sf).collect()
    assert(out.map(_.getAs[Int]("rn")).toSeq === (101 to 150))
    val keys = out.map(_.getAs[Long]("o_orderkey"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a < b })
    // key-range variant returns the same page when seeded with row 100's key
    val all = Tables.orders(spark, sf).orderBy("o_orderkey").limit(100).collect()
    val page = RelationalOps.pageByKeyRange(spark, sf, all.last.getAs[Long]("o_orderkey"), 50)
      .collect().map(_.getAs[Long]("o_orderkey"))
    assert(page.toSeq === keys.toSeq)
  }

  test("containsSearch: all hits actually match; no false negatives on a sample") {
    val out = RelationalOps.containsSearch(spark, sf)
    assert(out.filter(!col("c_name").contains("42") &&
      !lower(col("c_mktsegment")).contains("auto")).count() === 0)
    val expected = Tables.customer(spark, sf)
      .filter(col("c_name").contains("42") || lower(col("c_mktsegment")).contains("auto")).count()
    assert(out.count() === expected)
  }

  test("pageSeek: keyset page ≡ the window-pagination rows after the same cursor") {
    val seek = RelationalOps.pageSeek(spark, sf, afterKey = 400L, n = 50).collect()
    assert(seek.length === 50)
    val keys = seek.map(_.getAs[Long]("o_orderkey"))
    assert(keys.forall(_ > 400L))
    assert(keys.zip(keys.tail).forall { case (a, b) => a < b }) // strict: pk order
    // same rows as a full-sort pagination starting after the cursor
    val expected = Tables.orders(spark, sf).filter(col("o_orderkey") > 400L)
      .orderBy("o_orderkey").limit(50)
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.toSeq === expected.toSeq)
    // scale shape: partial top-k, not a global window
    val plan = RelationalOps.pageSeek(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected partial top-k in:\n$plan")
  }

  test("countEnvelope: ceil math") {
    val r = RelationalOps.countEnvelope(spark, sf).head
    val cnt = r.getAs[Long]("cnt")
    assert(r.getAs[Long]("total_pages") === (cnt + 49) / 50)
  }

  test("facetRollup: subtotal levels reconcile — months sum to grand total") {
    val rows = RelationalOps.facetRollup(spark, sf).collect()
    val leaf = rows.filter(r => r.getAs[Int]("g_month") == 0 && r.getAs[Int]("g_status") == 0)
    val monthly = rows.filter(r => r.getAs[Int]("g_month") == 0 && r.getAs[Int]("g_status") == 1)
    val grand = rows.filter(r => r.getAs[Int]("g_month") == 1 && r.getAs[Int]("g_status") == 1)
    assert(grand.length === 1)
    assert(leaf.map(_.getAs[Long]("n")).sum === grand.head.getAs[Long]("n"))
    assert(monthly.map(_.getAs[Long]("n")).sum === grand.head.getAs[Long]("n"))
    // grouping flags, not string sentinels, distinguish subtotal rows
    assert(monthly.forall(_.getAs[String]("o_orderstatus") === "ALL"))
  }

  test("compositeAgg: after-key pages tile the bucket space exactly, no overlap, no offset drift") {
    // ground truth: all buckets in key order
    val all = RelationalOps.compositeAgg(spark, sf, "1000-01", "", size = 100000)
      .collect().map(r => (r.getAs[String]("month"), r.getAs[String]("status"),
        r.getAs[Long]("n"), r.getAs[Double]("revenue")))
    assert(all.length > 25, "need multiple pages to exercise paging")
    // walk pages of 10 by after-key until exhausted — ES composite protocol
    var after = ("1000-01", "")
    var walked = Vector.empty[(String, String, Long, Double)]
    var page = RelationalOps.compositeAgg(spark, sf, after._1, after._2, size = 10).collect()
    while (page.nonEmpty) {
      walked ++= page.map(r => (r.getAs[String]("month"), r.getAs[String]("status"),
        r.getAs[Long]("n"), r.getAs[Double]("revenue")))
      after = (page.last.getAs[String]("month"), page.last.getAs[String]("status"))
      page = RelationalOps.compositeAgg(spark, sf, after._1, after._2, size = 10).collect()
    }
    assert(walked.toSeq === all.toSeq,
      "paged walk must reproduce the full bucket list exactly — the after " +
      "bucket itself excluded, nothing skipped, nothing duplicated")
    // keys strictly ascending across the whole walk
    val keys = walked.map(b => (b._1, b._2))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
  }

  test("topkPerGroup: at most k rows per group, ordered, true maxima") {
    val out = RelationalOps.topkPerGroup(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(out.nonEmpty)
    out.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
    // spot check one customer against a direct sort
    val (ck, rs) = out.head
    val direct = Tables.orders(spark, sf).filter(col("o_custkey") === ck)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(3)
      .collect().map(_.getAs[Long]("o_orderkey")).toSeq
    assert(rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("o_orderkey")).toSeq === direct)
  }

  test("pivotStatus: crosstab cells reconcile with the flat group-by; absent cells are 0") {
    val out = RelationalOps.pivotStatus(spark, sf).collect()
    assert(out.map(_.getString(0)).distinct.length === out.length)
    val flat = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val p = r.getString(0)
      Seq("O", "F", "P").foreach { s =>
        assert(r.getAs[Long](s) === flat.getOrElse((p, s), 0L))
      }
    }
  }

  test("extendedStats: moments reconcile; variance non-negative and matches a JVM replay") {
    val rows = graft.ops.RelationalOps.extendedStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val chars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    rows.foreach { r =>
      val xs = chars(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === xs.min && r.getLong(3) === xs.max)
      assert(r.getLong(4) === xs.sum)
      assert(r.getLong(5) === xs.map(x => x * x).sum)
      assert(r.getDouble(7) >= 0.0, "population variance must be non-negative")
    }
  }

  test("percentileRanks: fixed point bounded, monotone in the probe value, counts reconcile") {
    val rows = graft.ops.RelationalOps.percentileRanks(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((lang, v), (n, nLe, fp)) =>
      assert(nLe <= n, s"$lang@$v")
      assert(fp >= 0L && fp <= 104857600L, s"$lang@$v fixed point out of range")
      assert(fp === 104857600L * nLe / n)
    }
    // monotone: rank at 2000 >= rank at 500 for every lang
    rows.keys.map(_._1).toSeq.distinct.foreach { lang =>
      assert(rows((lang, 2000L))._3 >= rows((lang, 500L))._3, lang)
    }
  }

  test("filtersAgg/rangeAgg/multiTerms: bucket algebra reconciles to the corpus") {
    val n = Tables.documents(spark, sf).count()
    // filters: independent predicates — 'short' + 'long' never exceeds n,
    // and each bucket equals its own direct count
    val f = RelationalOps.filtersAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f.keySet === Set("short", "long", "en"))
    assert(f("short") === Tables.documents(spark, sf).filter(col("n_chars") < 500).count())
    assert(f("en") === Tables.documents(spark, sf).filter(col("lang") === "en").count())
    // range: a PARTITION — bucket counts sum to n exactly
    val rg = RelationalOps.rangeAgg(spark, sf).collect()
    assert(rg.map(_.getAs[Long]("doc_count")).sum === n)
    assert(rg.map(_.getAs[String]("key")).toSet.subsetOf(
      Set("*-500", "500-2000", "2000-*")))
    // multi_terms: compound-key doc_counts are the single-key counts' refinement
    val mt = RelationalOps.multiTermsAgg(spark, sf, size = 1000).collect()
    assert(mt.map(_.getAs[Long]("doc_count")).sum === n)
  }

  test("weightedAvg: matches a direct exact-decimal recomputation per group") {
    val rows = RelationalOps.weightedAvg(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)")).as("pw"),
        col("l_quantity").cast("decimal(18,2)").as("w"))
      .groupBy("l_returnflag").agg(sum("pw").as("pws"), sum("w").as("ws"))
      .collect()
      .map(r => r.getString(0) ->
        BigDecimal(r.getDecimal(1)) / BigDecimal(r.getDecimal(2))).toMap
    rows.foreach { r =>
      val got = r.getAs[Double]("weighted_avg_price")
      val want = direct(r.getString(0)).toDouble
      assert(math.abs(got - want) < 1e-5, r.getString(0))
    }
  }

  test("stringStats: closed-form entropy anchor on a hand corpus; fixture sane") {
    val dir = "/tmp/graft_string_stats_docs"
    import spark.implicits._
    // chars: a x2, b x2 -> exactly 1.0 bit of entropy; lengths 3 and 1
    Seq((1L, "aab"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val r = RelationalOps.stringStats(spark, dir).head()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 1.0, "uniform 2-symbol alphabet = 1 bit")
    val fx = RelationalOps.stringStats(spark, sf).head()
    assert(fx.getDouble(4) > 1.0 && fx.getDouble(4) < 8.0,
      "ASCII text entropy must sit between 1 and 8 bits/char")
  }

  test("matrixStats: exact closed form on a perfectly linear hand corpus") {
    val dir = "/tmp/graft_matrix_stats_li"
    import spark.implicits._
    // y = 100·x exactly: corr must be EXACTLY 1.0, cov = 100·var_x
    Seq.tabulate(5)(i => ("A", (i + 1).toDouble, 100.0 * (i + 1)))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(dir + "/lineitem.parquet")
    val r = RelationalOps.matrixStats(spark, dir).head()
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === 3.0 && r.getDouble(3) === 300.0)
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 20000.0)
    assert(r.getDouble(6) === 200.0)
    assert(r.getDouble(7) === 1.0, "perfect linear relation ⇒ correlation 1")
    // fixture sanity: every group's correlation is a valid coefficient
    RelationalOps.matrixStats(spark, sf).collect().foreach { g =>
      assert(math.abs(g.getDouble(7)) <= 1.0 && g.getDouble(4) >= 0.0, g.toString)
    }
  }

  test("tTest: Welch closed form on a hand corpus") {
    val dir = "/tmp/graft_ttest_events"
    import spark.implicits._
    // a = [1,2,3]: mean 2, s² 1; b = [2,4]: mean 3, s² 2
    // t = (2−3)/√(1/3 + 2/2) = −0.866025 at 6dp
    val rows = Seq(
      (1L, 1000L, 1L, "click", 1.0), (2L, 1001L, 1L, "click", 2.0),
      (3L, 1002L, 2L, "click", 3.0), (4L, 1003L, 2L, "purchase", 2.0),
      (5L, 1004L, 3L, "purchase", 4.0), (6L, 1005L, 3L, "view", 9.9))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val r = RelationalOps.tTest(spark, dir).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 3.0)
    assert(r.getDouble(4) === -0.866025)
  }

  test("boxplotMad: nearest-rank law on a hand group; MAD from the picked median") {
    val dir = "/tmp/graft_boxplot_docs"
    import spark.implicits._
    Seq.tabulate(8)(i => (i.toLong + 1, "en", "src", "x", i.toLong + 1))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val r = RelationalOps.boxplotMad(spark, dir).head()
    // ranks over 1..8: q1@rank2=2, median@rank4=4, q3@rank6=6;
    // deviations |x-4| sorted: 0,1,1,2,2,3,3,4 -> mad@rank4=2
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)) === ((8L, 1L, 2L, 4L, 6L, 8L, 2L)))
  }

  test("topMetrics: argmax on the unique sort key matches a brute recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("source"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val top = rows.maxBy(_._2)
      (lang, top._2, top._3, top._4)
    }.toSeq.sortBy(_._1)
    val got = RelationalOps.topMetrics(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture must produce per-lang argmax rows")
  }

  test("variableWidthHistogram: equal-count seeding, value-atomic buckets, exact centroids") {
    val B = 6
    val got = RelationalOps.variableWidthHistogram(spark, sf, B).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty && got.length <= B)
    // buckets tile the value domain in order, no overlap
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2,
        s"bucket ${a._1} max ${a._3} must precede bucket ${b._1} min ${b._2}")
      case _ =>
    }
    // reconciliation + per-bucket laws against a brute recompute
    val vals = Tables.documents(spark, sf).select(col("n_chars"))
      .collect().map(_.getLong(0)).sorted
    assert(got.map(_._4).sum === vals.length.toLong)
    val n = vals.length.toLong
    val byVal = vals.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cumBefore = 0L
    val expected = byVal.map { case (v, cnt) =>
      val b = (cumBefore * B) / n; cumBefore += cnt; (v, cnt, b)
    }.groupBy(_._3).toSeq.sortBy(_._1).map { case (b, vs) =>
      val cnt = vs.map(_._2).sum
      val centroid = BigDecimal(
        vs.map(x => x._1 * x._2).sum.toDouble / cnt)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (b, vs.map(_._1).min, vs.map(_._1).max, cnt, centroid)
    }
    assert(got.toSeq === expected)
    // hand corpus: skew makes widths genuinely variable — one hot value
    // occupies several equal-count cuts but stays value-atomic (one bucket)
    val dir = "/tmp/graft_vwh_docs"
    import spark.implicits._
    (Seq.fill(90)(100L) ++ Seq(200L, 300L, 400L, 500L, 600L, 700L, 800L,
      900L, 1000L, 1100L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("doc_id", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val hand = RelationalOps.variableWidthHistogram(spark, dir, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 100 rows, B=4 -> rank cuts at 25/50/75; value 100 (ranks 1-90) takes
    // bucket 0 whole; the 10 tail values (cum_before 90..99) land in bucket 3
    assert(hand === Array((0L, 100L, 100L, 90L), (3L, 200L, 1100L, 10L)))
  }
}
