package graft

import graft.ops.EventsOps
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpecBase {

  test("events loader: raw micros ↔ timestamp conversion is lossless") {
    val e = Tables.events(spark, sf)
    val n = e.count()
    assert(n > 0)
    // the raw long view must round-trip the converted timestamp exactly:
    // same row count, same distinct count, and value-identity µs-for-µs
    val raw = Tables.eventsRaw(spark, sf)
    assert(raw.count() === n)
    assert(raw.select(countDistinct(col("ts"))).head.getLong(0) ===
      e.select(countDistinct(unix_micros(col("ts")))).head.getLong(0))
    // and against the file's own inferred (timestamp_ntz) reading: equal
    // epoch-micros values on every row
    val ntz = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(cast(ts as timestamp)) as us")
    val joined = raw.selectExpr("event_id", "ts as raw_us")
      .join(ntz, "event_id")
    assert(joined.filter(col("raw_us") =!= col("us")).count() === 0)
  }

  test("watermarkScan: strictly-greater semantics") {
    val wmMs = java.sql.Timestamp.valueOf("2024-01-25 00:00:00").getTime
    val out = EventsOps.watermarkScan(spark, sf)
    assert(out.filter(col("ts_ms") <= wmMs).count() === 0)
    val total = Tables.events(spark, sf).count()
    val below = Tables.events(spark, sf).filter(unix_millis(col("ts")) <= wmMs).count()
    assert(out.count() === total - below)
  }

  test("eventsHourly: partitions all events; n_users bounded by n_events") {
    val out = EventsOps.eventsHourly(spark, sf)
    assert(out.select(sum("n_events")).head.getLong(0) === Tables.events(spark, sf).count())
    assert(out.filter(col("n_users") > col("n_events")).count() === 0)
  }

  test("windowLag: exactly one gap=-1 per user; gaps non-negative otherwise") {
    val out = EventsOps.windowLag(spark, sf)
    val users = Tables.events(spark, sf).select(countDistinct("user_id")).head.getLong(0)
    assert(out.filter(col("gap_ms") === -1).count() === users)
    assert(out.filter(col("gap_ms") < -1).count() === 0)
  }

  test("jsonExtract: per-type counts cover the table") {
    val out = EventsOps.jsonExtract(spark, sf)
    assert(out.select(sum("n")).head.getLong(0) === Tables.events(spark, sf).count())
  }

  test("asofAttribution: planted semantics — none-before, inclusive tie, carry-forward") {
    import spark.implicits._
    val tagged = Seq(
      // user 1: click before any purchase → -1 sentinels
      (10L, 1L, "click",    5000L),
      (11L, 1L, "purchase", 10000L),
      (12L, 1L, "click",    15000L), // → purchase 11
      (13L, 1L, "purchase", 20000L),
      (14L, 1L, "click",    25000L), // → purchase 13 (latest wins)
      (15L, 1L, "click",    20000L), // exact tie with purchase 13 → inclusive
      // user 2: only clicks → -1; other event types are ignored
      (20L, 2L, "click",    7000L),
      (21L, 2L, "view",     1000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = EventsOps.asofAttribution(tagged, "click", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("purchase_event_id"), r.getAs[Long]("ms_since_purchase"))).toMap
    assert(out(10L) === (-1L, -1L))
    assert(out(12L) === (11L, 5L))
    assert(out(14L) === (13L, 5L))
    assert(out(15L) === (13L, 0L)) // ts_r <= ts_l inclusive (ASOF semantics)
    assert(out(20L) === (-1L, -1L))
    assert(!out.contains(21L)) // non-click left rows are not emitted
  }

  test("rangeJoin: bucket decomposition ≡ the direct non-equi join") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts_us").as("pts"))
    val er = e.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("ts_us").as("ets"))
    // 30-minute window: sf0.001 is sparse enough that 60s yields zero pairs —
    // the equality must be exercised on a non-empty candidate set
    val windowUs = 30L * 60 * 1000 * 1000
    val naive = p.crossJoin(er)
      .filter(col("ets") >= col("pts") && col("ets") - col("pts") <= windowUs)
      .select("pid", "eid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = EventsOps.rangeJoin(spark, sf, windowUs).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("funnel: stage timestamps strictly ordered; out-of-order stages never count; stalls pinned") {
    val out = EventsOps.funnel(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t1, t2, t3) = (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
      val stage = r.getAs[Long]("stage")
      // prefix structure: a later stage implies all earlier ones
      assert(t3.isEmpty || (t2.nonEmpty && t1.nonEmpty))
      assert(t2.isEmpty || t1.nonEmpty)
      // strict temporal order within the funnel
      for (a <- t1; b <- t2) assert(a < b)
      for (b <- t2; c <- t3) assert(b < c)
      assert(stage === Seq(t1, t2, t3).count(_.nonEmpty))
    }
  }

  test("funnel fixture: a purchase BEFORE the click does not convert; ordered users do") {
    import spark.implicits._
    val t0 = 1700000000000000L
    val rows = Seq(
      // user 1: view < click < purchase → stage 3
      (1L, "view", t0), (1L, "click", t0 + 10), (1L, "purchase", t0 + 20),
      // user 2: purchase arrives BEFORE the click → stalls at stage 2
      (2L, "view", t0), (2L, "purchase", t0 + 5), (2L, "click", t0 + 10),
      // user 3: click only, never viewed → stage 0
      (3L, "click", t0 + 1))
    // ts written as the physical int64 micros eventsRaw reads verbatim
    val e = rows.toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    e.withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventsOps.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("stage")).toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L))
  }

  test("asofJoin: one output row per click; attribution never in the future") {
    val out = EventsOps.asofJoin(spark, sf)
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(out.count() === nClicks)
    assert(out.filter(col("ms_since_purchase") < -1).count() === 0)
    assert(out.filter(col("purchase_event_id") =!= -1 &&
      col("purchase_ts_ms") > col("ts_ms")).count() === 0)
  }

  test("retention fixture: cohorts by first-seen day, fixed-point shares exact") {
    import spark.implicits._
    val day = 86400L * 1000000 // one day of epoch micros
    // epoch date 2024-01-01 = micros 1704067200000000; day indexes offset from it
    val d0 = 1704067200000000L
    val rows = Seq( // user 1 active days 0,1,3; user 2 days 0,2; user 3 day 1
      (1L, d0), (1L, d0 + day), (1L, d0 + 3 * day),
      (2L, d0 + 1000), (2L, d0 + 2 * day),
      (3L, d0 + day + 5))
    val dir = java.nio.file.Files.createTempDirectory("retention").toString
    rows.toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventsOps.retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Long]("retained_fp"))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 2L, 1048576L)), // u1+u2 on their cohort day
      (0L, 1L) -> ((1L, 2L, 524288L)),  // only u1 back next day
      (0L, 2L) -> ((1L, 2L, 524288L)),  // only u2
      (0L, 3L) -> ((1L, 2L, 524288L)),  // only u1
      (1L, 0L) -> ((1L, 1L, 1048576L)))) // u3's own cohort
  }

  test("retention: day-0 row is the full cohort; shares never exceed 2^20; offsets capped") {
    val out = EventsOps.retention(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (off, nA, nC, fp) = (r.getLong(1), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_cohort"), r.getAs[Long]("retained_fp"))
      assert(off >= 0 && off <= 30)
      assert(nA <= nC && fp <= 1048576L)
      if (off == 0) assert(nA === nC && fp === 1048576L)
    }
  }

  test("volumeAnomaly fixture: the all-integer 2-sigma test flags the planted spike only") {
    import spark.implicits._
    val hour = 3600L * 1000000
    val t0 = 1704067200000000L
    // type "click", 10 hours: nine quiet hours of 1 event, one hour of 29;
    // type "flat", 10 hours of EXACTLY 1 event — zero variance, so 0 ≥ 0
    // would flag every hour without the positive-variance guard
    val clicks = ((0 until 9).map(h => t0 + h * hour) ++
      (0 until 29).map(i => t0 + 9 * hour + i * 1000L))
      .map(t => (t, "click"))
    val flats = (0 until 10).map(h => (t0 + h * hour, "flat"))
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toString
    (clicks ++ flats).zipWithIndex.map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventsOps.volumeAnomaly(spark, dir).collect()
    val got = out.filter(_.getString(0) == "click")
      .map(r => r.getLong(1) -> (r.getAs[Long]("n_events"), r.getAs[Boolean]("is_spike")))
      .toMap
    val spikeHour = t0 / hour + 9
    assert(got(spikeHour) === ((29L, true)))
    got.filterNot(_._1 == spikeHour).values.foreach { case (n, s) =>
      assert(n === 1L && !s)
    }
    // the flat series is the most NORMAL series there is — no hour flagged
    val flat = out.filter(_.getString(0) == "flat")
    assert(flat.length === 10)
    flat.foreach(r => assert(!r.getAs[Boolean]("is_spike")))
  }

  test("volumeAnomaly: per-type deviations sum to zero (the integer identity)") {
    val out = EventsOps.volumeAnomaly(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      // Σ(n·cnt − s) over a type's hours = cnt·s − cnt·s = 0 exactly
      assert(rows.map(_.getAs[Long]("dev_num")).sum === 0L)
    }
  }

  test("activeUsers: windows nest (dau <= wau <= mau); stickiness identity; spine = active days") {
    val out = EventsOps.activeUsers(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dau, wau, mau, st) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"), r.getAs[Long]("stickiness_fp"))
      assert(dau >= 1L && dau <= wau && wau <= mau)
      assert(st === (1048576L * dau) / mau)
    }
    val spine = Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("day_idx")).toSet === spine)
  }

  test("activeUsersApprox: sketch face tracks the exact face within HLL error on every day") {
    val exact = EventsOps.activeUsers(spark, sf).collect()
      .map(r => r.getAs[Long]("day_idx") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau"))).toMap
    val approx = EventsOps.activeUsersApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    // same day spine as the exact face (RANGE window ⇒ gap days stay correct)
    assert(approx.map(_.getAs[Long]("day_idx")).toSet === exact.keySet)
    // DataSketches HLL at the default lgConfigK=12 is ~1.6% RSE; 5% is a
    // generous cross-cutting bound that still catches a broken window frame
    // (a ROWS window over gap days would miss whole day-cohorts, not 5%)
    def close(a: Long, e: Long): Boolean = math.abs(a - e) <= math.max(1L, (e * 0.05).toLong)
    approx.foreach { r =>
      val (ed, ew, em) = exact(r.getAs[Long]("day_idx"))
      assert(close(r.getAs[Long]("dau"), ed), s"dau ${r.getAs[Long]("dau")} vs exact $ed")
      assert(close(r.getAs[Long]("wau"), ew), s"wau ${r.getAs[Long]("wau")} vs exact $ew")
      assert(close(r.getAs[Long]("mau"), em), s"mau ${r.getAs[Long]("mau")} vs exact $em")
      assert(r.getAs[Long]("stickiness_fp") ===
        (1048576L * r.getAs[Long]("dau")) / r.getAs[Long]("mau"))
    }
  }

  test("pipelineAgg: moving sum covers exactly the trailing week; first-bucket derivative is null") {
    val out = EventsOps.pipelineAgg(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("day_idx"))
      val byDay = sorted.map(r => r.getAs[Long]("day_idx") -> r.getAs[Long]("n")).toMap
      sorted.foreach { r =>
        val d = r.getAs[Long]("day_idx")
        val want = (d - 6 to d).flatMap(byDay.get).sum
        assert(r.getAs[Long]("mov7_sum") === want)
      }
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("delta")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b.getAs[Long]("day_idx") == a.getAs[Long]("day_idx") + 1)
            assert(b.getAs[Long]("delta") === b.getAs[Long]("n") - a.getAs[Long]("n"))
        case _ => ()
      }
    }
  }

  test("percentilesAgg: monotone across ps; every pick is a member of its group") {
    val out = EventsOps.percentilesAgg(spark, sf).collect()
    assert(out.length >= 2)
    val vals = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    out.foreach { r =>
      val ps = Seq("p25", "p50", "p75", "p95", "p99").map(r.getAs[Double])
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
      // nearest-rank selection returns OBSERVED values, never interpolation
      val members = vals(r.getAs[String]("event_type"))
      ps.foreach(v => assert(members.contains(v), s"$v not an observed value"))
    }
    // hand-check p50 on one group against a full sort
    val g = out.head.getAs[String]("event_type")
    val sorted = vals(g).toSeq.sorted
    val all = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === g)
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(out.head.getAs[Double]("p50") === all((all.length * 50 + 99) / 100 - 1))
    assert(sorted.nonEmpty)
  }

  test("percentilesApproxGraded: sketch ranks land inside the graded tolerance on every group") {
    val out = EventsOps.percentilesApproxGraded(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("ok25", "ok50", "ok75", "ok95", "ok99").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for ${r.getAs[String]("event_type")}")
      }
      // the exact columns ride along unchanged from the exact face
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p99"))
    }
  }

  test("percentilesApproxServed: every gate true; group counts reconcile with the table") {
    import org.apache.spark.sql.functions.col
    val out = EventsOps.percentilesApproxServed(spark, sf).collect()
    assert(out.nonEmpty)
    val counts = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n") === counts(g))
      Seq("ok25", "ok50", "ok75", "ok95", "ok99").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for $g")
      }
    }
  }

  test("dateHistogramFilled: contiguous hourly spine, zero-filled gaps, agg rows match the unfilled face") {
    import org.apache.spark.sql.functions._
    val out = EventsOps.dateHistogramFilled(spark, sf, "purchase")
      .collect().sortBy(_.getString(0))
    assert(out.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:00:00")
    val hours = out.map(r => java.time.LocalDateTime.parse(r.getString(0), fmt))
    hours.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.Duration.between(a, b).toHours === 1, s"spine gap at $a")
    }
    // sf0.001 purchases are sparse over 720 hours: the zero-fill is live
    val empty = out.filter(_.getLong(1) === 0L)
    assert(empty.nonEmpty, "expected at least one zero-filled bucket at sf0.001")
    empty.foreach { r =>
      assert(r.getDouble(2) === 0.0 && r.getLong(3) === 0L, "empty bucket not fully zeroed")
    }
    // non-empty buckets equal the plain GROUP BY face restricted to purchase
    val plain = EventsOps.eventsHourly(spark, sf)
      .filter(col("event_type") === "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    out.filter(_.getLong(1) > 0L).foreach { r =>
      val (n, sv, nu) = plain(r.getString(0))
      assert(r.getLong(1) === n && r.getDouble(2) === sv && r.getLong(3) === nu,
        s"bucket ${r.getString(0)} disagrees with the unfilled face")
    }
    assert(out.count(_.getLong(1) > 0L) === plain.size, "filled face dropped a non-empty bucket")
  }

  test("bucketPipeline: cumulative is pre-prune (ES pipeline order); selector and sort laws hold") {
    // sf0.001 daily buckets run ~5-10 events; the registered face's 40 is
    // calibrated to the sf0.01 gate scale — the LAW is threshold-invariant
    val minN = 5L
    val rows = EventsOps.bucketPipeline(spark, sf, minN = minN).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_._3 > minN), "bucket_selector: every survivor passes the predicate")
    // bucket_sort: (n desc, event_type, day_idx) order
    assert(rows.map(r => (-r._3, r._1, r._2)).toSeq ===
      rows.map(r => (-r._3, r._1, r._2)).sortBy(identity).toSeq)
    // cumulative_sum computes over the FULL histogram before pruning: the
    // survivor's cum equals the sum of ALL daily n at or before its day —
    // including pruned (n <= 40) days
    val daily = EventsOps.pipelineAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (t, d, _, cum) =>
      val want = daily.collect { case ((tt, dd), n) if tt == t && dd <= d => n }.sum
      assert(cum === want, s"$t@$d cumulative must include pruned buckets")
    }
  }

  test("autoDateHistogram: ladder picks the smallest fitting interval; buckets partition the events") {
    import spark.implicits._
    val dir = "/tmp/graft_auto_hist_events"
    // 101 events, one per second over a 100 s span: 1 s -> 101 buckets,
    // 5 s -> 21, 10 s -> 11 <= 12 — the ladder must pick 10 s
    Seq.tabulate(101)(i =>
        (i.toLong, i.toLong * 1000000L, 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val rows = EventsOps.autoDateHistogram(spark, dir).collect()
    assert(rows.forall(_.getLong(1) === 10000000L), "expected the 10 s rung")
    assert(rows.length === 11 && rows.map(_.getLong(2)).sum === 101L)
    // fixture: bucket count respects the target and counts reconcile
    val fx = EventsOps.autoDateHistogram(spark, sf).collect()
    assert(fx.length <= 12 && fx.nonEmpty)
    assert(fx.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
    // a tighter target never picks a smaller interval
    val tight = EventsOps.autoDateHistogram(spark, sf, targetBuckets = 3).collect()
    assert(tight.length <= 3)
    assert(tight.head.getLong(1) >= fx.head.getLong(1))
  }

  test("cumulativeCardinality: first-seen device equals a brute running distinct") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val days = events.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val seen = events.filter(_._2 <= d).map(_._1).distinct.size.toLong
      val newU = events.groupBy(_._1).count { case (_, evs) =>
        evs.map(_._2).min == d }.toLong
      (d.toLong, newU, seen)
    }
    val got = EventsOps.cumulativeCardinality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === expected.toSeq)
    // monotone + reconciliation laws
    assert(got.map(_._3) === got.map(_._3).sorted,
      "cumulative cardinality must be non-decreasing")
    assert(got.map(_._2).sum === got.last._3,
      "sum of first-seen counts must equal the final cardinality")
  }

  test("movingFn: trailing RANGE median + lag-7 serial diff match a brute recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = EventsOps.movingFn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.nonEmpty)
    got.foreach { case (t, d, n, med, diff) =>
      val series = daily.filter(_._1 == t)
      assert(series.find(x => x._2 == d).map(_._3).contains(n))
      // RANGE frame: days in [d-6, d] that EXIST (gaps excluded)
      val window = series.filter(x => x._2 >= d - 6 && x._2 <= d)
        .map(_._3).sorted
      val m = window.length
      val wantMed = if (m % 2 == 1) window(m / 2).toDouble
        else (window(m / 2 - 1) + window(m / 2)).toDouble / 2.0
      assert(med === wantMed, s"$t@$d median $med vs $wantMed over $window")
      // lag-7 is ROW-based: the 7th prior OBSERVED day of the same type
      val prior = series.filter(_._2 < d).sortBy(_._2)
      val want7 = if (prior.length >= 7) Some(n - prior(prior.length - 7)._3)
        else None
      assert(diff === want7, s"$t@$d diff7 $diff vs $want7")
    }
  }

  test("normalizeAgg + bucketScript + siblingStats: shares, rates, and sibling metrics reconcile") {
    // normalize (percent_of_sum): each type's shares sum to 1 within the
    // 6dp rounding budget of its bucket count
    val norm = EventsOps.normalizeAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(norm.nonEmpty)
    norm.groupBy(_._1).foreach { case (t, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { case (_, _, n, pct) =>
        val want = BigDecimal(n.toDouble / total)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(pct === want, s"$t share")
      }
      assert(math.abs(rows.map(_._4).sum - 1.0) < rows.length * 5e-7)
    }
    // bucket_script: errors/total per day against direct counts
    val bs = EventsOps.bucketScript(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val totalEvents = Tables.events(spark, sf).count()
    assert(bs.map(_._2).sum === totalEvents)
    bs.foreach { case (d, total, errors, rate) =>
      assert(errors <= total)
      val want = BigDecimal(errors.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate === want, s"day $d rate")
    }
    // sibling aggs: recompute from the daily histogram
    val daily = EventsOps.pipelineAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val sib = EventsOps.siblingStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    sib.foreach { case (t, nb, mn, mx, sm, avg) =>
      val ns = daily.filter(_._1 == t).map(_._2)
      assert((nb, mn, mx, sm) === ((ns.length.toLong, ns.min, ns.max, ns.sum)))
      val want = BigDecimal(ns.sum.toDouble / ns.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(avg === want)
    }
    assert(sib.map(_._1).toSeq === sib.map(_._1).sorted.toSeq)
  }

  test("dateRangeAgg: from-inclusive/to-exclusive partition reconciles with the table") {
    val rows = EventsOps.dateRangeAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum === total,
      "date ranges must partition every event exactly once")
    // boundary law: an event ON 2024-01-10 lands in the second range
    val jan10 = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-10").cast("date")).count()
    if (jan10 > 0) {
      val mid = Tables.events(spark, sf)
        .filter(to_date(col("ts")) >= lit("2024-01-10").cast("date") &&
          to_date(col("ts")) < lit("2024-01-20").cast("date")).count()
      assert(rows.find(_._1 == "r1_0110_0120").map(_._2).contains(mid))
    }
  }
}
