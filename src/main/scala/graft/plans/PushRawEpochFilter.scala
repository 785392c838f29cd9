package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite timestamp comparisons on an epoch-long-to-
  * timestamp conversion column back onto the raw long, and push the Filter
  * below the converting Project — so the predicate reaches the parquet scan
  * (PushedFilters + row-group pruning).
  *
  * Motivation: `Tables.events` exposes `ts = timestamp_micros(raw)` so that
  * watermark predicates compare long-vs-long on the file's physical int64.
  * A user's natural `df.filter($"ts" > lit)` is then an
  * expression-over-column predicate that CANNOT push down — at 100 TB that
  * is a full scan per watermark poll. This rule restores pushdown for the
  * natural spelling instead of requiring every call site to hand-translate
  * to the raw epoch unit (as EventsOps.watermarkScan does defensively).
  *
  * Two conversion shapes are matched:
  *
  *   1. `timestamp_micros(raw)` — a raw epoch-µs store (the current events
  *      table). TimestampType's internal value IS epoch micros, so the map
  *      is a monotone bijection Long↔Timestamp and every comparison rewrites
  *      1:1: `timestamp_micros(raw) cmp TS_LIT ⟺ raw cmp micros(TS_LIT)`.
  *
  *   2. `timestamp_micros(raw div 1000)` — a raw epoch-NANOsecond store
  *      (how earlier generations of the events table arrived; any ns-grain
  *      source hits this). The division is lossy, so the rewrite needs
  *      floor-division algebra (exact — no boundary rows gained/lost):
  *   raw div 1000 >  L  ⟺  raw ≥ (L+1)·1000
  *   raw div 1000 ≥  L  ⟺  raw ≥ L·1000
  *   raw div 1000 <  L  ⟺  raw < L·1000
  *   raw div 1000 ≤  L  ⟺  raw < (L+1)·1000
  *   raw div 1000 =  L  ⟺  L·1000 ≤ raw < (L+1)·1000
  * where L is the literal's internal micros value. Null semantics are
  * preserved (null raw ⇒ null on both forms ⇒ row dropped).
  *
  * Installed either via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (cluster config) or `GraftExtensions.install(spark)` (running session,
  * uses experimental.extraOptimizations).
  */
object PushRawEpochFilter extends Rule[LogicalPlan] {

  /** Matches the conversion expression `timestamp_micros(raw div 1000)` and
    * yields the raw ns column. By the time this rule runs (final batch),
    * Spark's own PushPredicateThroughNonJoin has already substituted the
    * `ts` alias into the Filter condition, so we match the substituted
    * expression form — not the Project alias.
    */
  private object TsFromNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) if divisorIs1000(d) => Some(d.left)
      case _ => None
    }
  }

  /** Matches the direct conversion `timestamp_micros(raw)` (no division) —
    * the raw column already carries epoch micros. Excludes the divide shape
    * so the two patterns stay disjoint (the divide needs offset algebra; a
    * direct rewrite would leave the division in the predicate, unpushable).
    */
  private object TsFromMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) if divisorIs1000(d) => None
      case MicrosToTimestamp(raw) if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  private def divisorIs1000(d: IntegralDivide): Boolean = d.right match {
    case Literal(1000L, LongType) => true
    case Cast(Literal(1000, _), LongType, _, _) => true
    case _ => false
  }

  private val MaxSafeMicros = Long.MaxValue / 1000 - 1000

  /** Rewrite only for overflow-safe, strictly POSITIVE literals. The algebra
    * below assumes floor division, but Spark's IntegralDivide truncates
    * toward zero — the two diverge for negative raw (pre-1970 ns). With a
    * positive literal L (≥ 1 µs) every comparison evaluates identically under
    * trunc and floor for ALL raw (negative raw falls strictly on one side of
    * any positive bound either way), so the rewrite stays exact; literals at
    * or before the epoch simply don't get pushdown.
    */
  private def safe(l: Literal): Boolean = {
    val v = l.value.asInstanceOf[Long]
    v > 0 && v < MaxSafeMicros
  }
  private def us(l: Literal): Long = l.value.asInstanceOf[Long]

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // direct µs store: bijection, every comparator maps 1:1 (mirrors too).
    // The null guard is load-bearing even though NullPropagation normally
    // folds `ts cmp NULL` away first: with that rule excluded via
    // spark.sql.optimizer.excludedRules, us(null) would unbox to 0L and
    // rewrite a never-true predicate into a row-selecting `raw cmp 0`.
    case cmp @ BinaryComparison(TsFromMicros(raw), l @ Literal(_, TimestampType))
        if l.value != null =>
      cmp.withNewChildren(Seq(raw, Literal(us(l), LongType)))
    case cmp @ BinaryComparison(l @ Literal(_, TimestampType), TsFromMicros(raw))
        if l.value != null =>
      cmp.withNewChildren(Seq(Literal(us(l), LongType), raw))
    // ns store behind a div-to-µs conversion: floor-division algebra
    case GreaterThan(TsFromNanos(raw), l @ Literal(_, TimestampType)) if safe(l) =>
      GreaterThanOrEqual(raw, Literal((us(l) + 1) * 1000L, LongType))
    case GreaterThanOrEqual(TsFromNanos(raw), l @ Literal(_, TimestampType)) if safe(l) =>
      GreaterThanOrEqual(raw, Literal(us(l) * 1000L, LongType))
    case LessThan(TsFromNanos(raw), l @ Literal(_, TimestampType)) if safe(l) =>
      LessThan(raw, Literal(us(l) * 1000L, LongType))
    case LessThanOrEqual(TsFromNanos(raw), l @ Literal(_, TimestampType)) if safe(l) =>
      LessThan(raw, Literal((us(l) + 1) * 1000L, LongType))
    case EqualTo(TsFromNanos(raw), l @ Literal(_, TimestampType)) if safe(l) =>
      And(GreaterThanOrEqual(raw, Literal(us(l) * 1000L, LongType)),
          LessThan(raw, Literal((us(l) + 1) * 1000L, LongType)))
    // mirrored literal-first spellings
    case LessThan(l @ Literal(_, TimestampType), TsFromNanos(raw)) if safe(l) =>
      GreaterThanOrEqual(raw, Literal((us(l) + 1) * 1000L, LongType))
    case LessThanOrEqual(l @ Literal(_, TimestampType), TsFromNanos(raw)) if safe(l) =>
      GreaterThanOrEqual(raw, Literal(us(l) * 1000L, LongType))
    case GreaterThan(l @ Literal(_, TimestampType), TsFromNanos(raw)) if safe(l) =>
      LessThan(raw, Literal(us(l) * 1000L, LongType))
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), TsFromNanos(raw)) if safe(l) =>
      LessThan(raw, Literal((us(l) + 1) * 1000L, LongType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter conditions only: rewriting the conversion inside projections
    // would change output VALUES; inside a boolean predicate it is an exact
    // equivalence, and the raw-column comparison is source-pushable.
    case f @ Filter(cond, _) =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}

/** SparkSessionExtensions entry point (`spark.sql.extensions`): the
  * optimizer rule plus graft's native expressions as SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PushRawEpochFilter)
    // one shared builder per function (TextFunctionBuilders /
    // VectorFunctionBuilders) — the same closures GraftFunctions.register
    // uses, so validation can never drift between the two paths
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_slots"),
      new ExpressionInfo(classOf[graft.functions.MinHashSlots].getName, "minhash_slots"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.minhashSlots(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.simhash64(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("md5_minhash"),
      new ExpressionInfo(classOf[graft.functions.Md5MinHash].getName, "md5_minhash"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.md5MinHash(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ru_en_analyze"),
      new ExpressionInfo(classOf[graft.functions.RuEnAnalyze].getName, "ru_en_analyze"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.ruEnAnalyze(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[graft.functions.LshSig].getName, "lsh_sig"),
      { exprs: Seq[Expression] => graft.functions.VectorFunctionBuilders.lshSig(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[graft.functions.VecCosine].getName, "vec_cosine"),
      { exprs: Seq[Expression] => graft.functions.VectorFunctionBuilders.vecCosine(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_sanity"),
      new ExpressionInfo(classOf[graft.functions.VecSanity].getName, "vec_sanity"),
      { exprs: Seq[Expression] => graft.functions.VectorFunctionBuilders.vecSanity(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[graft.functions.IvfAssign].getName, "ivf_assign"),
      { exprs: Seq[Expression] => graft.functions.VectorFunctionBuilders.ivfAssign(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("gram_hash60"),
      new ExpressionInfo(classOf[graft.functions.GramHash60].getName, "gram_hash60"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.gramHash60(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("gram_hash60_pos"),
      new ExpressionInfo(classOf[graft.functions.GramHash60Pos].getName, "gram_hash60_pos"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.gramHash60Pos(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("gram_buckets"),
      new ExpressionInfo(classOf[graft.functions.GramBuckets].getName, "gram_buckets"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.gramBuckets(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hash60"),
      new ExpressionInfo(classOf[graft.functions.ShingleHash60].getName, "shingle_hash60"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.shingleHash60(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("text_metrics"),
      new ExpressionInfo(classOf[graft.functions.TextMetrics].getName, "text_metrics"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.textMetrics(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("gram_stats"),
      new ExpressionInfo(classOf[graft.functions.GramStats].getName, "gram_stats"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.gramStats(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[graft.functions.PhraseCount].getName, "phrase_count"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.phraseCount(exprs) }))
    // keep the TWO registration surfaces identical (r15 review): the
    // extensions path had drifted behind the GraftFunctions registry by
    // bpe_count / winnow_select, and distinct_sorted_concat joins both
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[graft.functions.BpeCount].getName, "bpe_count"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.bpeCount(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[graft.functions.WinnowSelect].getName, "winnow_select"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.winnowSelect(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("eval_fence"),
      new ExpressionInfo(classOf[graft.functions.EvalFence].getName, "eval_fence"),
      { exprs: Seq[Expression] => graft.functions.TextFunctionBuilders.evalFence(exprs) }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("distinct_sorted_concat"),
      new ExpressionInfo(classOf[graft.functions.DistinctSortedConcat].getName,
        "distinct_sorted_concat"),
      { exprs: Seq[Expression] =>
        graft.functions.AggregateFunctionBuilders.distinctSortedConcat(exprs) }))
  }
}

object GraftExtensions {
  /** Install on an already-running session (extraOptimizations runs as a
    * final optimizer batch — after constant folding, which our matcher
    * relies on). Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PushRawEpochFilter))
      spark.experimental.extraOptimizations = cur :+ PushRawEpochFilter
  }
}
