package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-path column defaults — the reference's model-layer mixins
  * (my_app/movies/models.py:9-24) re-expressed as sink decorators:
  *
  *  - F15 `UUIDMixin`: `id = uuid4()` primary-key default. Spark's built-in
  *    `uuid()` expression (codegen'd, per-row, no UDF) fills ONLY missing
  *    keys — source-provided ids pass through, so re-ingesting the same rows
  *    stays idempotent for keyed data.
  *  - F16 `TimeStampedMixin`: `created = auto_now_add` (stamped once, on
  *    first insert, preserved across upserts) and `modified = auto_now`
  *    (refreshed on every write).
  *
  * Both are per-row narrow transformations — no shuffle, no scale concern.
  * `auto_now_add` preservation on upsert needs the existing store's
  * (id, created) pairs: a co-partitioned left join on the upsert key, which
  * the merge in IncrementalDocPipeline already pays for — zero extra
  * shuffles when applied there.
  *
  * Nondeterministic columns (uuid, current_timestamp) can't be
  * oracle-hash-checked; IngestDefaultsSpec pins the contracts instead
  * (v4 format, uniqueness, preservation, monotonicity).
  */
object IngestDefaults {

  /** F15: fill missing primary keys with uuid4 (models.py:20-24). */
  def withUuidKey(df: DataFrame, keyCol: String = "id"): DataFrame =
    if (df.columns.contains(keyCol))
      df.withColumn(keyCol, coalesce(col(keyCol).cast("string"), expr("uuid()")))
    else df.withColumn(keyCol, expr("uuid()"))

  /** F16 insert face: stamp both `created` and `modified` (auto_now_add +
    * auto_now on a fresh row).
    */
  def stampInsert(df: DataFrame): DataFrame = df
    .withColumn("created", current_timestamp())
    .withColumn("modified", current_timestamp())

  /** F16 upsert face: refresh `modified` on every incoming row; carry the
    * existing row's `created` forward (auto_now_add = write-once), stamping
    * it only for ids the store has never seen.
    */
  def stampUpsert(incoming: DataFrame, existing: DataFrame, keyCol: String = "id"): DataFrame = {
    val prev =
      if (existing.columns.contains("created"))
        existing.select(col(keyCol), col("created").as("__prev_created"))
      else existing.select(col(keyCol)).withColumn("__prev_created", lit(null).cast("timestamp"))
    incoming
      .drop("created", "modified")
      .join(prev, Seq(keyCol), "left")
      .withColumn("created", coalesce(col("__prev_created"), current_timestamp()))
      .withColumn("modified", current_timestamp())
      .drop("__prev_created")
  }
}
