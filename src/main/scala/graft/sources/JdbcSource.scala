package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC read surface (reference: the SQLite paged extractor
  * sqlite_to_postgres/sqlite_extractor_file.py:13-20 with LIMIT/OFFSET step
  * 3000, and the ETL's server-side cursor scan etl/main.py:324-331).
  *
  * The paging/cursor mechanics disappear on Spark: `partitionColumn` +
  * `numPartitions` splits the table into range predicates executed in
  * parallel by executors, and a watermark predicate is pushed into the remote
  * scan via `pushdownPredicate` — the T3 `modified > wm` shape.
  *
  * No database exists in this container (zero egress), so `options` — the
  * pure planning surface — is what the unit test pins; `read` is the two-line
  * consumer of it.
  */
final case class JdbcSourceConfig(
    url: String,
    table: String,
    partitionColumn: Option[String] = None,
    lowerBound: Option[String] = None,
    upperBound: Option[String] = None,
    numPartitions: Int = 8,
    fetchSize: Int = 10000,
    pushdownPredicate: Option[String] = None) {

  /** The exact option map handed to the DataFrameReader. */
  def options: Map[String, String] = {
    val dbtable = pushdownPredicate match {
      // predicate pushed inside the remote query, not filtered post-transfer
      case Some(p) => s"(SELECT * FROM $table WHERE $p) AS src"
      case None    => table
    }
    Map("url" -> url, "dbtable" -> dbtable,
        "fetchsize" -> fetchSize.toString) ++
      partitionColumn.map(c => Map(
        "partitionColumn" -> c,
        "lowerBound" -> lowerBound.getOrElse(
          throw new IllegalArgumentException("lowerBound required with partitionColumn")),
        "upperBound" -> upperBound.getOrElse(
          throw new IllegalArgumentException("upperBound required with partitionColumn")),
        "numPartitions" -> numPartitions.toString)).getOrElse(Map.empty)
  }
}

object JdbcSource {
  def read(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame =
    spark.read.format("jdbc").options(cfg.options).load()
}
