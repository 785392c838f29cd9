package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY `SparkEntry.queries` entry end-to-end against the real
  * driver testdata (sf0.001) — the guard the round-6 silent loss showed was
  * missing: a testdata schema drift (events.parquet moving ns → µs) broke
  * seven queries with ANALYSIS-time errors that no synthetic-frame spec
  * could see, and the driver's correctness artifact simply shipped with
  * fewer entries, still "all green". After this suite, a query that fails
  * at analysis or execution time against the actual parquet fails `sbt
  * test`, not just a correctness diff nobody diffs for cardinality.
  *
  * Execution goes through the same no-op sink the bench uses, so the full
  * plan runs (scan, shuffle, codegen) without collecting rows to the test
  * JVM. The keyset test pins the other half of the contract: every query
  * must carry a DuckDB oracle and every oracle a query — an entry dropped
  * from either map is a silent downgrade of the driver's gate.
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val haveData = new java.io.File(s"$sf/documents.parquet").exists()

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("entry flagship query returns rows") {
    assume(haveData, s"$sf not present")
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  test("registerViews: the whole catalog answers plain spark.sql") {
    assume(haveData, s"$sf not present")
    Tables.registerViews(spark, sf)
    // a cross-table ANSI query straight off the views — no programmatic API
    val r = spark.sql(
      """SELECT count(*) AS n, min(o.o_orderdate) AS first_order
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin)
      .head
    assert(r.getLong(0) > 0L)
    // events registers CONVERTED (TimestampType ts); the raw face pushes down
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL").head.getLong(0) > 0L)
    assert(spark.sql("SELECT count(*) FROM events_raw WHERE ts > 0").head.getLong(0) > 0L)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes end-to-end on $sf") {
      assume(haveData, s"$sf not present")
      withClue(s"$name: ") {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
    }
  }
}
