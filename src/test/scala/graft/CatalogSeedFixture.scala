package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** FIXTURES.md family-A realization: the reference's seed catalog
  * (999 film_work / 26 genre / 4,166 person / 2,231 genre_film_work /
  * 5,783 person_film_work) extracted from the pg_dump COPY blocks of
  * /root/reference/postgres/init.sql (lines 516-13754) into parquet — the
  * "init.sql-derived full extract" FIXTURES.md §A prescribes for the G1-G7
  * golden suite. Data only; no reference code is involved.
  */
object CatalogSeedFixture {

  private val InitSql = "/root/reference/postgres/init.sql"

  /** pg COPY text-format unescape: \N is SQL NULL; \\, \t, \n, \r are the
    * only escapes this dump uses (verified: no \b \f \v or octal present).
    * Split on the doubled backslash FIRST (chained replaces would decode
    * the `\t` inside `...\\t...` as a tab instead of backslash + 't'),
    * unescape the single-char escapes per segment, rejoin with `\`.
    */
  private def unescape(v: String): String =
    if (v == "\\N") null
    else v.split("""\\\\""", -1)
      .map(_.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r"))
      .mkString("\\")

  private def parseCopyBlocks(): Map[String, (Seq[String], Vector[Array[String]])] = {
    val src = scala.io.Source.fromFile(InitSql, "UTF-8")
    try {
      val out = scala.collection.mutable.Map[String, (Seq[String], Vector[Array[String]])]()
      var table: String = null
      var cols: Seq[String] = Nil
      var rows = Vector.newBuilder[Array[String]]
      val header = """COPY content\.(\w+) \(([^)]*)\) FROM stdin;""".r
      for (line <- src.getLines()) {
        if (table == null) {
          header.findFirstMatchIn(line).foreach { m =>
            table = m.group(1)
            cols = m.group(2).split(",").toSeq.map(_.trim)
            rows = Vector.newBuilder
          }
        } else if (line == "\\.") {
          out(table) = (cols, rows.result())
          table = null
        } else {
          rows += line.split("\t", -1).map(unescape)
        }
      }
      out.toMap
    } finally src.close()
  }

  private def schemaOf(name: String): StructType = {
    def s(n: String) = StructField(n, StringType)
    def ts(n: String) = StructField(n, StringType) // parsed to timestamp below
    name match {
      case "film_work" => StructType(Seq(s("id"), s("title"), s("description"),
        s("creation_date"), s("rating"), s("type"), ts("created"), ts("modified"),
        s("certificate"), s("file_path")))
      case "genre" => StructType(Seq(s("id"), s("name"), s("description"),
        ts("created"), ts("modified")))
      case "person" => StructType(Seq(s("id"), s("full_name"), ts("created"), ts("modified")))
      case "genre_film_work" => StructType(Seq(s("id"), s("genre_id"),
        s("film_work_id"), ts("created")))
      case "person_film_work" => StructType(Seq(s("id"), s("person_id"),
        s("film_work_id"), s("role"), ts("created")))
    }
  }

  /** Columns cast from the dump's text form to their DDL types
    * (postgres/init.sql:36-105 / movies_database.ddl).
    */
  private def typed(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def toTs(c: String) = to_timestamp(regexp_replace(col(c), "\\+00$", ""))
    name match {
      case "film_work" => df
        .withColumn("creation_date", col("creation_date").cast("date"))
        .withColumn("rating", col("rating").cast("double"))
        .withColumn("created", toTs("created"))
        .withColumn("modified", toTs("modified"))
      case "genre" | "person" => df
        .withColumn("created", toTs("created"))
        .withColumn("modified", toTs("modified"))
      case _ => df.withColumn("created", toTs("created"))
    }
  }

  /** Parse once per JVM, write parquet once; return the fixture dir. */
  lazy val dir: String = {
    val spark = TestSpark.spark
    val base = java.nio.file.Files.createTempDirectory("graft_catalog_seed").toString
    val blocks = parseCopyBlocks()
    for ((name, (cols, rows)) <- blocks) {
      val schema = schemaOf(name)
      require(cols == schema.fieldNames.toSeq,
        s"$name columns drifted: dump=$cols expected=${schema.fieldNames.toSeq}")
      val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r.toIndexedSeq: _*)), 4)
      typed(spark, name, spark.createDataFrame(rdd, schema))
        .write.mode("overwrite").parquet(s"$base/$name.parquet")
    }
    base
  }
}
