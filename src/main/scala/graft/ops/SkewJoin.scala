package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin`) can't apply: a hot key
  * (the "null customer", the default genre) lands one reducer with 100×
  * the median partition and the stage straggles.
  *
  * Shape: the large side gets a deterministic per-row salt in [0, salts);
  * the small side is replicated `salts` times; the join key becomes
  * (key, salt), so the hot key's rows spread over `salts` reducers. The
  * salt derives from `hash(*)` of the row — content-deterministic, so
  * retried tasks re-produce the same salt (a `rand()` salt breaks
  * recomputed-lineage consistency).
  *
  * Cost: `salts ×` replication of the small side — use for dim-sized
  * right sides only; for fact×fact skew, prefer AQE or isolate the hot
  * keys with a two-pass union (hot via broadcast, rest via shuffle).
  */
object SkewJoin {

  /** Join types preserving correctness under small-side replication: an
    * unmatched small-side row exists `salts` times, so any join type that
    * emits unmatched RIGHT rows (right/full outer) would duplicate them.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti")

  def salted(large: DataFrame, small: DataFrame, key: String,
             salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")) ||
            SafeJoinTypes.contains(joinType.toLowerCase),
      s"salted join supports $SafeJoinTypes; '$joinType' would emit each " +
      "unmatched small-side row once per salt")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
