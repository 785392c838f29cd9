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
  * Salt = hash(row content, monotonically_increasing_id()). Content alone
  * is not enough: the motivating skew case is often millions of
  * BYTE-IDENTICAL rows of the hot key (the repeated default/null-pattern
  * row), and a pure content hash gives them all one salt — the hot key
  * lands back on a single reducer. The id mixes in (partition, position),
  * spreading identical rows. Two properties make this safe where a plain
  * `rand()` salt is not:
  *  - the OUTPUT never depends on the salt value — the small side carries
  *    every salt, so each large row matches exactly the same rows whatever
  *    salt it draws; only the reducer placement changes;
  *  - under task retry the id is recomputed from the same (partition,
  *    position) for deterministically-ordered inputs (file scans — the
  *    normal large side). If the input is itself a shuffle with
  *    nondeterministic order, a recomputed partition may re-salt rows, but
  *    by the first property the join result is still correct — unlike
  *    rand(), which Spark must treat as nondeterministic and which blocks
  *    pushdown around it.
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
      pmod(hash(large.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
