package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query end-to-end (full plan
  * execution into a no-op sink, so scan/shuffle/codegen costs all count and
  * no rows funnel back to the driver) and prints one JSON line.
  */
object Bench {
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
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      try {
        runOnce(fn); runOnce(fn)
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          runOnce(fn)
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => name -> timeOne(name, fn) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val baseline = readBaseline(sfDir)
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
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$baselineJson}"""
    // the driver captures only the last N bytes of stdout and the line has
    // outgrown it before — persist the full artifact so each round's bench
    // is self-contained even under tail truncation
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    println(line)
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
