package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin`) can't apply: a hot key
  * (the "null customer", the default genre) lands one reducer with 100×
  * the median partition and the stage straggles.
  *
  * Shape: the large side gets a per-row salt in [0, salts); the small side
  * is replicated `salts` times; the join key becomes (key, salt), so the
  * hot key's rows spread over `salts` reducers.
  *
  * Salt = hash(row content [+ caller-named discriminator columns]) —
  * STRICTLY deterministic per row value. Never `rand()` and never
  * `monotonically_increasing_id()`: both assign salts by execution
  * position, so a partial stage retry over a nondeterministically-ordered
  * upstream shuffle can re-salt a recomputed row into a DIFFERENT reducer
  * than the one that already consumed its first copy — the row is then
  * joined twice or zero times. A value-deterministic salt recomputes
  * identically on any retry.
  *
  * Known limitation of the default (content-only) salt: millions of rows
  * byte-identical across EVERY column — the repeated default/null-pattern
  * row — all hash to ONE salt and still land a single reducer (a table
  * with any unique column never hits this; its content hash already
  * spreads). For that case pass `spread`: extra discriminator
  * expression(s) mixed into the hash. The caller owns its determinism —
  * sound choices are value-derived only (a computed offset, a lineage
  * column added before a checkpoint); `monotonically_increasing_id()` is
  * sound ONLY directly over a deterministically-ordered file scan, never
  * above a shuffle. Fully indistinguishable rows with no sound
  * discriminator cannot be spread safely by ANY salting scheme —
  * pre-aggregate them (count per key) instead of joining row-by-row.
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
             salts: Int, joinType: String = "inner",
             spread: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")) ||
            SafeJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"salted join supports $SafeJoinTypes; '$joinType' would emit each " +
      "unmatched small-side row once per salt")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col) ++ spread: _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
