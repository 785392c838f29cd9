package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an EXPENSIVE projection where it stands.
  *
  * The optimizer fence of the optimization guide §4.4, as a native
  * expression: when a filter references a column computed by an expensive
  * expression (analyzer pass, fuzzy scorer, rolling phrase scan),
  * `PushPredicateThroughNonJoin` inlines the alias into the predicate and
  * pushes the filter below the projection — and below any exchange under
  * it. The query then evaluates the expensive expression TWICE per
  * surviving row (once in the pushed filter, once in the projection), and
  * on the compute-spread scan faces the pushed copy lands BELOW the
  * spread exchange, i.e. back on the single scan task the exchange exists
  * to escape (measured: q_search_query_string 0.47 → 0.68 s when the
  * spread landed without this fence).
  *
  * Marking the expression non-deterministic is the documented contract
  * for "may not be reordered, duplicated, or constant-folded": predicate
  * pushdown requires every projection field deterministic, so the filter
  * stays put and the value is computed ONCE, above the exchange. Value
  * semantics are untouched — eval and codegen delegate to the child
  * verbatim (FunctionsSpec pins bit-equality and the blocked pushdown).
  *
  * Deliberately NOT extending Nondeterministic: there is no state to
  * initialize, and eval must stay a pure delegate.
  */
case class EvalFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): EvalFence =
    copy(child = newChild)
  override def prettyName: String = "eval_fence"
}
