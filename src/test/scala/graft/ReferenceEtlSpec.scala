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

  test("composed loop: one CDC sequence rebuilds docs, freshens the search index, flags a near-dup") {
    // the reference's whole operating loop (etl/main.py:357-385) as one
    // assertion: poll changes → rebuild documents → re-index for search —
    // plus the ingestion-time near-dup screen a curation deployment bolts
    // onto the same tick. Three maintained faces, one change feed.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{IncrementalSearchPipeline, StreamingOps}
    import graft.ops.SearchOps
    implicit val s: SparkSession = spark

    val cbase = "/tmp/graft_composed_loop"
    val cfeed = s"$cbase/feed"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(cbase), true)

    // plant the near-dup INSIDE the real data: two orders by the same
    // customer with the same status have identical doc text under the
    // text projection below (customer/nation/region/status all match)
    val pair = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
      .agg(min("l_partkey").as("p"), min("l_suppkey").as("su"))
      .groupBy("o_custkey", "o_orderstatus")
      .agg(sort_array(collect_set(struct(col("o_orderkey"), col("p"), col("su")))).as("m"))
      .filter(size(col("m")) >= 2)
      .orderBy(col("o_custkey"), col("o_orderstatus")).limit(1)
      .select(explode(slice(col("m"), 1, 2))).collect()
    val Array(r1, r2) = pair.map(_.getStruct(0))
    val (o1, o2) = (r1.getLong(0), r2.getLong(0))

    def writeCFeed(r: org.apache.spark.sql.Row, ts: String): Unit =
      Seq((r.getLong(0), r.getLong(1), r.getLong(2), ts))
        .toDF("order_id", "part_id", "supp_id", "m")
        .withColumn("modified", col("m").cast("timestamp")).drop("m")
        .write.mode(SaveMode.Append).parquet(cfeed)

    val etl = new ReferenceEtl(sf, cbase, s => s.read.parquet(cfeed))
    // search face: index the REBUILT documents — text is a projection of
    // the movies store, modified rides in from the same change feed
    def docText(df: DataFrame): DataFrame = df.select(col("id").as("doc_id"),
      concat_ws(" ", col("customer"), col("nation"), col("region"), col("status")).as("text"))
    val search = new IncrementalSearchPipeline(
      changes = s => docText(s.read.parquet(s"$cbase/movies_store"))
        .join(s.read.parquet(cfeed).select(col("order_id").as("doc_id"), col("modified")),
          Seq("doc_id")),
      storePath = s"$cbase/postings_store",
      statePath = s"$cbase/postings_state")
    // near-dup face: the tick's rebuilt docs stream through the stateful
    // LSH screen — micro-batch per tick, detection across ticks
    val nd = MemoryStream[(Long, String)](spark)
    val ndq = StreamingOps.streamingNearDup(nd.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("composed_nd").outputMode("append").start()
    try {
      def tickedDocs(ids: Seq[Long]): Seq[(Long, String)] =
        docText(spark.read.parquet(s"$cbase/movies_store"))
          .filter(col("doc_id").isin(ids: _*)).as[(Long, String)].collect().toSeq

      // tick 1: first order changes — doc store rebuilds it, index learns
      // its tokens, near-dup screen admits it silently
      writeCFeed(r1, "2024-01-01 10:00:00")
      assert(etl.tickAll(spark)("movies") === 1L)
      assert(search.tick(spark) === 1L)
      nd.addData(tickedDocs(Seq(o1)): _*)
      ndq.processAllAvailable()
      assert(spark.table("composed_nd").count() === 0, "no duplicate exists yet")

      // tick 2: the same-customer order changes — rebuilt, indexed, FLAGGED
      writeCFeed(r2, "2024-01-01 11:00:00")
      assert(etl.tickAll(spark)("movies") === 1L)
      assert(search.tick(spark) === 1L)
      nd.addData(tickedDocs(Seq(o2)): _*)
      ndq.processAllAvailable()

      // docs: both rebuilt docs converged to the full build
      val store = storeRowsAt(s"$cbase/movies_store")
      Seq(o1, o2).foreach { k =>
        val got = store.filter(col("id") === k).collect()
        val want = DocumentOps.orderDocsDF(spark, sf).filter(col("id") === k).collect()
        assert(got.length === 1 && want.length === 1 && got.head.toSeq === want.head.toSeq)
      }
      // search: the maintained postings serve both docs for the shared
      // tokens — identical text ⇒ identical token sets
      val postings = graft.streaming.IncrementalPostings.load(spark, s"$cbase/postings_store")
      val byDoc = postings.filter(col("doc_id").isin(o1, o2))
        .collect().groupBy(_.getAs[Long]("doc_id"))
        .map { case (d, rs) => d -> rs.map(r => (r.getAs[String]("token"), r.getAs[Long]("tf"))).toSet }
      assert(byDoc.keySet === Set(o1, o2))
      assert(byDoc(o1) === byDoc(o2), "identical text must index identically")
      assert(byDoc(o1).nonEmpty)
      // and the search face finds BOTH through the store
      val hits = SearchOps.postingsSearch(postings, byDoc(o1).head._1)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(Set(o1, o2).subsetOf(hits))
      // near-dup: the cross-tick pair surfaced with full signature agreement
      val dups = spark.table("composed_nd").collect()
        .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
          r.getAs[Double]("est_jaccard"))).toSet
      assert(dups === Set((math.min(o1, o2), math.max(o1, o2), 1.0)))

      // watermarks: every face is caught up — the next tick is a no-op
      assert(etl.tickAll(spark) === Map("movies" -> 0L, "genres" -> 0L, "persons" -> 0L))
      assert(search.tick(spark) === 0L)
    } finally ndq.stop()
  }

  private def storeRowsAt(path: String): DataFrame = spark.read.parquet(path)

  test("streaming face: crash BETWEEN pipelines mid-batch, restart from checkpoint converges") {
    import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
    import org.apache.spark.sql.types._
    val sbase = "/tmp/graft_refetl_stream"
    val (src, ckpt) = (s"$sbase/feed_stream", s"$sbase/ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sbase), true)

    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey").limit(3).collect()
    def feedRow(i: Int, ts: String) =
      (lines(i).getLong(0), lines(i).getLong(1), lines(i).getLong(2), ts)
    def writeFeedFile(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("order_id", "part_id", "supp_id", "m")
        .withColumn("modified", col("m").cast("timestamp")).drop("m")
        .write.mode(SaveMode.Append).parquet(src)

    val feedSchema = StructType(Seq(
      StructField("order_id", LongType), StructField("part_id", LongType),
      StructField("supp_id", LongType), StructField("modified", TimestampType)))

    // crash injection: die AFTER movies committed its store+watermark but
    // BEFORE genres/persons ran — the worst tick boundary (reference analog:
    // SIGKILL between the three state-key queries of the forever loop)
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit = {
      val q = spark.readStream.schema(feedSchema).parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val e = new ReferenceEtl(sf, sbase, _ => batch)
          e.movies.tick(spark)
          if (crashOnce.getAndSet(false))
            throw new RuntimeException("injected crash between pipelines")
          e.genres.tick(spark)
          e.persons.tick(spark)
          ()
        }
        .start()
      q.awaitTermination()
    }

    writeFeedFile(Seq(feedRow(0, "2024-01-01 10:00:00"), feedRow(1, "2024-01-01 10:00:01")))
    intercept[StreamingQueryException](run()) // batch NOT committed: genres/persons never ran
    // partial state on disk: movies store exists, genres/persons don't yet
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sbase/movies_store")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sbase/genres_store")))

    run() // restart: checkpoint re-delivers the batch; movies re-tick is a
          // watermark no-op, genres/persons catch up — at-least-once + idempotent
    def assertStore(name: String, full: DataFrame, keys: Set[Long]): Unit = {
      val store = spark.read.parquet(s"$sbase/${name}_store")
      assert(store.count() === keys.size, s"$name store size")
      assert(store.select("id").distinct().count() === keys.size, s"$name dup ids")
      keys.foreach { k =>
        val got = store.filter(col("id") === k).collect()
        val want = full.filter(col("id") === k).collect()
        assert(got.length === 1 && want.length === 1 && got.head.toSeq === want.head.toSeq,
          s"$name doc $k diverges from full rebuild")
      }
    }
    val (os, ps, ss) = (Set(lines(0).getLong(0), lines(1).getLong(0)),
                        Set(lines(0).getLong(1), lines(1).getLong(1)),
                        Set(lines(0).getLong(2), lines(1).getLong(2)))
    assertStore("movies", DocumentOps.orderDocsDF(spark, sf), os)
    assertStore("genres", DocumentOps.genreDocsDF(spark, sf), ps)
    assertStore("persons", DocumentOps.personDocsDF(spark, sf), ss)

    // post-recovery increment: a NEW file streams through the same checkpoint
    writeFeedFile(Seq(feedRow(2, "2024-01-01 11:00:00")))
    run()
    assertStore("movies", DocumentOps.orderDocsDF(spark, sf), os + lines(2).getLong(0))
    assertStore("genres", DocumentOps.genreDocsDF(spark, sf), ps + lines(2).getLong(1))
    assertStore("persons", DocumentOps.personDocsDF(spark, sf), ss + lines(2).getLong(2))
  }
}
