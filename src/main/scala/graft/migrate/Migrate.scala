package graft.migrate

import graft.sinks.DedupeAppendSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch migration + reconciliation (reference: sqlite_to_postgres/
  * load_data.py:37-70 table copy loop; my_app/tests/check_consistency/ —
  * row-count equality test_rows_num.py:34-53, column-set equality
  * test_column_names.py:34-53, data-shape test_data.py:34-48).
  *
  * The copy is a dedupe-append per table (idempotent re-run, like the
  * reference's ON CONFLICT DO NOTHING makes its loader); reconciliation is
  * upgraded from the reference's counts-and-names to a full checksum diff.
  */
object Migrate {

  final case class ReconcileReport(
      srcRows: Long, dstRows: Long,
      srcOnlyKeys: Long, dstOnlyKeys: Long,
      columnsMatch: Boolean, checksumMatch: Boolean) {
    def ok: Boolean =
      srcRows == dstRows && srcOnlyKeys == 0 && dstOnlyKeys == 0 &&
        columnsMatch && checksumMatch
  }

  /** Copy one table with insert-if-absent semantics; returns rows appended. */
  def copyTable(spark: SparkSession, srcPath: String, dstPath: String,
                key: String): Long =
    DedupeAppendSink.append(spark.read.parquet(srcPath), dstPath, key)

  /** The reference's WHOLE migration (load_data.py:37-70 — discover every
    * table in sqlite_master, page it out, ON-CONFLICT-DO-NOTHING load,
    * then reconcile) run end-to-end over a REAL `.sqlite` file through
    * the pure-JVM reader: each table streams out in step-3000 leaf-page
    * partitions, lands in a parquet warehouse via the dedupe-append sink
    * (idempotent re-runs, like the reference's ON CONFLICT), and is
    * reconciled counts/keys/columns/checksum. Returns (appended rows,
    * report) per table.
    */
  def migrateSqliteDb(spark: SparkSession, sqlitePath: String,
                      dstRoot: String, key: String = "id",
                      stepRows: Int = 3000): Map[String, (Long, ReconcileReport)] = {
    val ordered = graft.sources.SqliteFile.tables(sqlitePath)
      // virtual tables (rootpage 0) hold no b-tree rows, and sqlite_*
      // internals (sqlite_sequence, sqlite_stat*) are bookkeeping, not
      // data — neither is part of a table migration (r14 review)
      .filter(t => t.rootPage >= 1 && !t.name.startsWith("sqlite_"))
      // the reference loads tables in NAME-LENGTH order
      // (load_data.py:47 `db_name_list.sort(key=len)`, a stable sort, so
      // equal-length names keep sqlite_master order — as does sortBy).
      // Semantically inert for a parquet warehouse with no FK cascades,
      // but it is the last observable divergence from the reference's
      // migration and costs nothing (r14 verdict task 4). The returned
      // ListMap iterates in load order so SqliteSpec can pin it.
      .sortBy(_.name.length)
      .map { t =>
        val src = graft.sources.SqliteFile.read(spark, sqlitePath, t.name, stepRows)
        // tables without the conventional key column fall back to their
        // first column (the fixture's types_zoo keys on its rowid alias);
        // the dedupe-append sink keeps ONE row per key, so a non-unique
        // key would silently drop rows — fail loud instead (r14 review)
        val keyCol = if (src.columns.contains(key)) key else src.columns.head
        // one job for the whole key gate. NULL keys are rejected BY NAME
        // (not folded into "not unique"): the dedupe-append anti-join can
        // never match a NULL key, so such rows would re-append on every
        // run — non-idempotent, the exact property the sink exists for
        val u = src.agg(count(lit(1)).as("n"),
          countDistinct(col(keyCol)).as("d"),
          count(when(col(keyCol).isNull, 1)).as("nulls")).head
        require(u.getLong(2) == 0,
          s"table '${t.name}': key column '$keyCol' contains NULLs — the " +
            "dedupe-append anti-join cannot match them; pass a non-null key")
        require(u.getLong(0) == u.getLong(1),
          s"table '${t.name}': key column '$keyCol' is not unique — pass " +
            "a unique key or the dedupe-append load would drop rows")
        val dst = s"$dstRoot/${t.name}"
        val appended = DedupeAppendSink.append(src, dst, keyCol)
        t.name -> ((appended, reconcile(src, spark.read.parquet(dst), keyCol)))
      }
    scala.collection.immutable.ListMap(ordered: _*)
  }

  /** Source↔sink reconciliation: counts, key anti-joins both ways, column
    * sets, and an order-independent whole-table checksum (sum of per-row
    * xxhash64 over canonically-ordered columns). One pass per side.
    */
  def reconcile(src: DataFrame, dst: DataFrame, key: String): ReconcileReport = {
    val srcCols = src.columns.sorted.toSeq
    val dstCols = dst.columns.sorted.toSeq
    val columnsMatch = srcCols == dstCols

    def checksum(df: DataFrame): BigDecimal =
      if (!columnsMatch) BigDecimal(0)
      // decimal(38) accumulator: ANSI-safe (a long sum overflows at ~4B rows).
      // Null-sentinel each column: xxhash64 skips null children, so ('x',null)
      // and (null,'x') would otherwise collide — a value drifting between
      // columns must fail the checksum.
      else df.select(xxhash64(srcCols.map(c =>
            coalesce(col(c).cast("string"), lit("\u0000null"))): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head.getDecimal(0)

    ReconcileReport(
      srcRows = src.count(),
      dstRows = dst.count(),
      srcOnlyKeys = src.select(key).join(dst.select(key), Seq(key), "left_anti").count(),
      dstOnlyKeys = dst.select(key).join(src.select(key), Seq(key), "left_anti").count(),
      columnsMatch = columnsMatch,
      checksumMatch = columnsMatch && checksum(src) == checksum(dst))
  }
}
