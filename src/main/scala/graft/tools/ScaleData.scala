package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: derive an sf·N dataset from an existing testdata dir by
  * unioning N key-shifted copies of every table — the measurement rig for
  * the dispatch-floor amortization claim (queries >2× DuckDB locally are
  * defended as "fixed ~0.1-0.3 s/query dispatch that amortizes at scale";
  * this produces the 10× corpus that lets BASELINE.md carry measured
  * scaling exponents instead of the plausible-but-unmeasured story).
  *
  * Copy 0 is the ORIGINAL data bit-for-bit, so every query seeded by
  * absolute ids (codebook = vec_id < 16, composed-tick feed = doc_id < 100,
  * seed doc 7, query vector 0) still resolves to the same seed rows; copies
  * 1..N−1 shift every key by i·stride (stride = max key + 1, FK-consistent
  * across fact/dim tables) and DIVERSIFY the payload so the bigger corpus
  * is new data, not duplicates that would quadratically corrupt the dedup
  * tier's pair joins:
  *   - documents.text rotates the 13-letter "etaoinshrdlcu" alphabet per
  *     copy (word/whitespace structure, token counts, and Zipf shape
  *     preserved; vocabulary LARGELY disjoint per copy — words containing
  *     none of those 13 letters pass through byte-identical, so treat the
  *     copies as distinct-vocab "sources" with a small shared residue);
  *   - embeddings rotate their dims by i (norm preserved, direction new);
  *   - events shift user_id/event_id (10× the users on the same clock).
  * region/nation are fixed dims and copy through unchanged.
  *
  * NOT part of the engine: a measurement tool, run manually
  * (`runMain graft.tools.ScaleData <src> <dst> <factor>`).
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <dstDir> <factor>")
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      // getAs[Number]: key columns are long in the shipped testdata but an
      // int-typed key must widen, not throw (r11 ADVICE)
      df.agg(max(col(key))).head.getAs[Number](0).longValue + 1L

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[scale] $name -> $dst/$name.parquet")
    }

    // fixed dims: copy through
    write("region", t("region"))
    write("nation", t("nation"))

    val docs = t("documents")
    val emb = t("embeddings")
    val ev = t("events")
    val ord = t("orders")
    val li = t("lineitem")
    val cust = t("customer")
    val supp = t("supplier")
    val part = t("part")
    val (dS, eS, evS, uS, oS, cS, pS, sS) = (
      stride(docs, "doc_id"), stride(emb, "vec_id"), stride(ev, "event_id"),
      stride(ev, "user_id"), stride(ord, "o_orderkey"),
      stride(cust, "c_custkey"), stride(part, "p_partkey"),
      stride(supp, "s_suppkey"))

    def copies(df: DataFrame)(tr: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => tr(df, i)).reduce(_ unionByName _)

    // 13 high-frequency letters rotated per copy: word shape and counts
    // survive, vocabulary becomes copy-disjoint. The alphabet length must
    // EXCEED the factor, or rot(i) cycles and copies i and i+|alpha| carry
    // byte-identical text — exact cross-copy duplicates, precisely the
    // corruption this transform exists to avoid (a 7-letter alphabet at
    // factor 10 silently duplicated 3 copies; caught in round-11 review).
    val alpha = "etaoinshrdlcu"
    require(factor <= alpha.length,
      s"factor $factor exceeds the rotation period ${alpha.length} — " +
        "copies would repeat verbatim; extend the alphabet first")
    def rot(i: Int): String = {
      val r = i % alpha.length
      alpha.drop(r) + alpha.take(r)
    }

    write("documents", copies(docs) { (d, i) =>
      if (i == 0) d
      else d.select((col("doc_id") + lit(i * dS)).as("doc_id"),
        translate(col("text"), alpha, rot(i)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    })

    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    write("embeddings", copies(emb) { (d, i) =>
      if (i == 0) d
      else d.select((col("vec_id") + lit(i * eS)).as("vec_id"),
        concat(slice(col("embedding"), i + 1, dim - i),
          slice(col("embedding"), 1, i)).as("embedding"),
        col("label"))
    })

    write("events", copies(ev) { (d, i) =>
      if (i == 0) d
      else d.select((col("event_id") + lit(i * evS)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * uS)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    })

    write("orders", copies(ord) { (d, i) =>
      if (i == 0) d
      else d.select((col("o_orderkey") + lit(i * oS)).as("o_orderkey"),
        (col("o_custkey") + lit(i * cS)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    })

    write("lineitem", copies(li) { (d, i) =>
      if (i == 0) d
      else d.select((col("l_orderkey") + lit(i * oS)).as("l_orderkey"),
        (col("l_partkey") + lit(i * pS)).as("l_partkey"),
        (col("l_suppkey") + lit(i * sS)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    })

    write("customer", copies(cust) { (d, i) =>
      if (i == 0) d
      else d.select((col("c_custkey") + lit(i * cS)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    })

    write("supplier", copies(supp) { (d, i) =>
      if (i == 0) d
      else d.select((col("s_suppkey") + lit(i * sS)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    })

    write("part", copies(part) { (d, i) =>
      if (i == 0) d
      else d.select((col("p_partkey") + lit(i * pS)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    })

    spark.stop()
  }
}
