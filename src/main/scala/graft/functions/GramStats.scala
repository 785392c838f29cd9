package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document word-gram repetition counters (Gopher-style filters,
  * Rae et al. 2021): ONE traversal of the token array computes everything the
  * explode + double `groupBy(doc_id, gram)` aggregation + join pipeline
  * produced —
  *
  *   struct(
  *     n_bigrams       = total bigram occurrences   (= max(|toks| − 1, 1))
  *     top_bigram_n    = occurrences of the single most frequent bigram
  *     n_trigrams      = total trigram occurrences  (= max(|toks| − 2, 1))
  *     dup_trigram_occ = Σ occurrences of trigrams appearing ≥ 2 times)
  *
  * These are PER-DOCUMENT quantities — no cross-document state exists — so
  * computing them in a row-local expression removes the doc_id shuffle the
  * composed form pays: q_repetition becomes shuffle-FREE and the curation
  * filter chain a pure projection.
  *
  * Bit-identical to the composed reference ([[graft.ops.TextOps]]
  * `repetitionStatsComposed`, asserted in FunctionsSpec + PropertySpec):
  *  - gram i (1-based, i ∈ [1, max(|toks| − (g−1), 1)]) is
  *    `concat_ws(" ", try_element_at(toks, i), …)` — out-of-range and null
  *    elements are DROPPED by concat_ws (replicated via
  *    `UTF8String.concatWs`, the exact runtime Spark's ConcatWs calls), so a
  *    1-token doc yields one degenerate "bigram" equal to that token — same
  *    partial-gram edge the decontaminate/ngramJaccard oracles replay;
  *  - counts use binary UTF8String equality — identical to the string
  *    equality the groupBy aggregated with.
  *
  * Memory: the count maps hold at most one entry per gram OCCURRENCE, i.e.
  * they are bounded by the document's own token count — the same per-row
  * bound the composed path already materialized as the exploded gram array.
  * A single giant document degrades to one big per-row map, not executor
  * OOM (the array itself is the dominant allocation either way).
  *
  * Null input → null.
  */
case class GramStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = GramStats.schema
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("dup_trigram_occ", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    @inline def tok(j: Int): UTF8String = if (j < n) toks(j) else null

    // bigrams: count per distinct gram, track the max inline
    val nBi = math.max(n - 1, 1)
    val bi = new java.util.HashMap[UTF8String, java.lang.Long](nBi * 2)
    var topBi = 0L
    i = 0
    while (i < nBi) {
      val g = UTF8String.concatWs(Space, tok(i), tok(i + 1))
      val c = bi.getOrDefault(g, 0L) + 1L
      bi.put(g, c)
      if (c > topBi) topBi = c
      i += 1
    }

    // trigrams: count per distinct gram, then sum the multiplicities ≥ 2
    val nTri = math.max(n - 2, 1)
    val tri = new java.util.HashMap[UTF8String, java.lang.Long](nTri * 2)
    i = 0
    while (i < nTri) {
      val g = UTF8String.concatWs(Space, tok(i), tok(i + 1), tok(i + 2))
      tri.put(g, tri.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    var dup = 0L
    val it = tri.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c >= 2L) dup += c
    }
    new GenericInternalRow(Array[Any](nBi.toLong, topBi, nTri.toLong, dup))
  }
}
