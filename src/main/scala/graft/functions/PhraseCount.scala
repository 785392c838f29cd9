package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native phrase-occurrence counter over an analyzed token array — the
  * match_phrase hot path (reference golden class: the ES phrase queries the
  * Postman corpus exercises against the movies index,
  * /root/reference/etl/json/ETLTests-2.json): the number of positions `i`
  * with `toks[i..i+n−1] == phrase` element-for-element, overlaps included
  * (ES counts positions, not disjoint spans).
  *
  * Exactly the composed higher-order form
  * `size(filter(sequence(1, size−n+1), i -> slice(toks,i,n) == phrase))`
  * (FunctionsSpec asserts bit-equality, including the null-element rule: a
  * window containing a SQL NULL token never matches, because the composed
  * array-equality yields NULL and filter drops it) — but as ONE codegen'd
  * rolling scan with zero per-window allocations. The composed form is
  * interpreted (higher-order lambdas never enter Janino) and allocates a
  * slice array plus an equality walk per window: measured 19.7 s for the
  * corpus scan at sf0.1 where this expression runs it in well under a
  * second — the difference between a usable phrase query and a regression.
  *
  * The phrase rides in as a foldable literal (an analyzed query is tiny and
  * known at plan time) bound via `addReferenceObj`, mirroring
  * [[IvfAssign]]'s codebook discipline.
  */
case class PhraseCount(child: Expression, phrase: Array[UTF8String])
    extends UnaryExpression with ExpectsInputTypes {

  require(phrase.nonEmpty, "phrase must be non-empty")
  require(phrase.forall(_ != null), "phrase tokens must be non-null")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  override def nullSafeEval(input: Any): Any =
    PhraseCount.compute(input.asInstanceOf[ArrayData], phrase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val phRef = ctx.addReferenceObj("phraseToks", phrase,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val cls = PhraseCount.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cls.compute($v, $phRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)
}

object PhraseCount {
  /** Shared by interpreted eval and codegen: one left-to-right scan; a
    * window mismatches on the first unequal (or null) token.
    */
  def compute(toks: ArrayData, phrase: Array[UTF8String]): Long = {
    val n = phrase.length
    val len = toks.numElements()
    var count = 0L
    var i = 0
    while (i <= len - n) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        if (toks.isNullAt(i + j) ||
            !phrase(j).equals(toks.getUTF8String(i + j))) ok = false
        j += 1
      }
      if (ok) count += 1L
      i += 1
    }
    count
  }
}
