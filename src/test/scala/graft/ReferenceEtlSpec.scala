package graft

import graft.ops.DocumentOps
import graft.streaming.ReferenceEtl
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full three-pipeline tick over the star schema: one change
  * feed fans into movies/genres/persons rebuilds, each store converging to
  * the full-build ops restricted to the touched keys.
  */
class ReferenceEtlSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = "/tmp/graft_refetl_test"
  private val feedPath = s"$base/feed"

  private def writeFeed(rows: Seq[(Long, Long, Long, String)], mode: SaveMode): Unit =
    rows.toDF("order_id", "part_id", "supp_id", "m")
      .withColumn("modified", col("m").cast("timestamp")).drop("m")
      .write.mode(mode).parquet(feedPath)

  private def etl() = new ReferenceEtl(
    dataDir = sf,
    workDir = base,
    changes = (s: SparkSession) => s.read.parquet(feedPath))

  private def storeRows(name: String): DataFrame =
    spark.read.parquet(s"$base/${name}_store")

  test("one changed line refreshes its order, part, and supplier docs; stores match full builds") {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    // pick two real lineitems to "change"
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey").limit(2).collect()
    val (o1, p1, s1) = (lines(0).getLong(0), lines(0).getLong(1), lines(0).getLong(2))
    val (o2, p2, s2) = (lines(1).getLong(0), lines(1).getLong(1), lines(1).getLong(2))

    writeFeed(Seq((o1, p1, s1, "2024-01-01 10:00:00")), SaveMode.Overwrite)
    val e = etl()
    val n1 = e.tickAll(spark)
    assert(n1 === Map("movies" -> 1L, "genres" -> 1L, "persons" -> 1L))

    // each store holds exactly the touched entity's doc, equal to the
    // corresponding FULL build restricted to that key (T4: full rebuild
    // from all rows, not just the changed one)
    def assertMatchesFull(store: DataFrame, full: DataFrame, key: Long): Unit = {
      val got = store.filter(col("id") === key).collect()
      val want = full.filter(col("id") === key).collect()
      assert(got.length === 1 && want.length === 1)
      assert(got.head.toSeq === want.head.toSeq)
    }
    assertMatchesFull(storeRows("movies"), DocumentOps.orderDocsDF(spark, sf), o1)
    assertMatchesFull(storeRows("genres"), DocumentOps.genreDocsDF(spark, sf), p1)
    assertMatchesFull(storeRows("persons"), DocumentOps.personDocsDF(spark, sf), s1)

    // round 2: a second line changes — only ITS keys rebuild, stores grow,
    // previous docs stay intact
    writeFeed(Seq((o2, p2, s2, "2024-01-01 11:00:00")), SaveMode.Append)
    val n2 = e.tickAll(spark)
    assert(n2("movies") === 1L)
    assert(storeRows("movies").count() === (if (o1 == o2) 1 else 2))
    assertMatchesFull(storeRows("movies"), DocumentOps.orderDocsDF(spark, sf), o1)
    assertMatchesFull(storeRows("movies"), DocumentOps.orderDocsDF(spark, sf), o2)
    assertMatchesFull(storeRows("genres"), DocumentOps.genreDocsDF(spark, sf), p2)
    assertMatchesFull(storeRows("persons"), DocumentOps.personDocsDF(spark, sf), s2)

    // caught up: all three watermarks independent and persistent
    assert(etl().tickAll(spark) === Map("movies" -> 0L, "genres" -> 0L, "persons" -> 0L))
  }
}
