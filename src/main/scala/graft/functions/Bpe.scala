package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token counting (Sennrich et al. 2016; the GPT-2
  * encoder's merge mechanics) — the "real subword tokenizer" face of the
  * token-budget signal. `q_token_count`'s `bpe_tokens` column counts
  * PRE-tokenizer pieces; this applies an actual rank-ordered merges table
  * inside each piece, so the count is a genuine BPE vocabulary size the
  * way a training pipeline budgets sequence lengths.
  *
  * Model: [[BpeModel.merges]] is a FIXTURE merges table (32 high-frequency
  * English merges, rank-ordered) — the offline artifact a real deployment
  * trains and ships; [[graft.ops.TextOps.bpeTrainMerges]] is the training
  * loop that produces such a table from a corpus (distributed word-count →
  * driver-side dictionary merge loop, the classic BPE trainer shape), and
  * a trained table drops into the same `merges` slot. The fixture face is
  * what the DuckDB oracle replays (a trained table can't be inlined into a
  * statically-authored oracle).
  *
  * Encoding semantics, pinned for cross-engine replay:
  *  - pre-tokenize with `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (the same
  *    pattern q_token_count's piece count uses);
  *  - pieces that are not pure ASCII letters never merge (the merge
  *    alphabet is lowercase letters): their token count is their
  *    codepoint count;
  *  - letter pieces start as single characters and apply each merge IN
  *    RANK ORDER, one exhaustive leftmost-first pass per rank.
  *
  * Rank-order application ≡ the canonical "merge the lowest-rank pair
  * present, repeat" loop because the table is VALID (checked at class
  * load): any multi-character merge side is produced by an earlier rank,
  * and a merge at rank s can only create pairs INVOLVING its new token —
  * a pair of rank q < s has both sides formed before rank q, so no
  * occurrence of it can appear after rank q's pass. A single left-to-right
  * pass per rank is exhaustive because merging (a,b)→ab cannot create a
  * new (a,b) adjacency (ab ≠ a and ab ≠ b). The same two arguments make
  * the oracle's one-global-regexp-replace-per-rank chain exact.
  */
object BpeModel {

  /** Rank-ordered merges: common English pairs, each multi-char side
    * formed by an earlier rank (validity asserted below).
    */
  val merges: Vector[(String, String)] = Vector(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "e" -> "d", "o" -> "u",
    "in" -> "g", "s" -> "t", "a" -> "t", "e" -> "n", "o" -> "r",
    "t" -> "o", "i" -> "s", "i" -> "t", "a" -> "l", "a" -> "r",
    "o" -> "f", "e" -> "s", "l" -> "l", "o" -> "m", "st" -> "r",
    "a" -> "s", "c" -> "h", "l" -> "e", "w" -> "h", "th" -> "at",
    "the" -> "r", "in" -> "e")

  /** Validity: every side longer than one char is the output of an earlier
    * merge. This is exactly the property a TRAINED table has by
    * construction (a token must be merged into existence before it can be
    * a side), and it is what licenses sequential rank-order application.
    */
  def requireValid(ms: Seq[(String, String)]): Unit = {
    val formed = scala.collection.mutable.Set[String]()
    ms.zipWithIndex.foreach { case ((a, b), r) =>
      for (s <- Seq(a, b) if s.length > 1)
        require(formed.contains(s),
          s"merge table invalid at rank ${r + 1}: side '$s' never formed")
      formed += (a + b)
    }
  }
  requireValid(merges)

  /** The shared pre-tokenizer (identical to q_token_count's piece regex). */
  val PreTokPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val PreTok = java.util.regex.Pattern.compile(PreTokPattern)
  private val Letters = java.util.regex.Pattern.compile("[A-Za-z]+")

  /** Total BPE token count of a text under a merges table. Driver-callable
    * and the static target of [[BpeCount]]'s codegen.
    */
  def countTokens(s: String, ms: IndexedSeq[(String, String)]): Long = {
    val m = PreTok.matcher(s)
    var total = 0L
    while (m.find()) total += countPiece(m.group(), ms)
    total
  }

  def countTokens(s: String): Long = countTokens(s, merges)

  /** Token count of ONE pre-tokenizer piece. */
  def countPiece(piece: String, ms: IndexedSeq[(String, String)]): Long = {
    if (!Letters.matcher(piece).matches())
      return piece.codePointCount(0, piece.length).toLong
    if (piece.length == 1) return 1L
    var toks: Array[String] = piece.toCharArray.map(_.toString)
    var r = 0
    while (r < ms.length && toks.length > 1) {
      val (a, b) = ms(r)
      toks = mergePass(toks, a, b)
      r += 1
    }
    toks.length.toLong
  }

  /** One exhaustive leftmost-first, non-overlapping merge pass. */
  def mergePass(toks: Array[String], a: String, b: String): Array[String] = {
    var hit = false
    var i = 0
    while (!hit && i < toks.length - 1) {
      if (toks(i) == a && toks(i + 1) == b) hit = true
      i += 1
    }
    if (!hit) return toks
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }
}

/** `bpe_count(text)`: BPE token count under the fixture merges table —
  * null-safe, one fused traversal per row, no shuffle. Bit-identical to
  * the composed regexp-replace-chain reference
  * ([[graft.ops.TextOps.tokenCountBpeComposed]], FunctionsSpec) and to the
  * DuckDB oracle's chain replay; the equivalence argument lives on
  * [[BpeModel]].
  */
case class BpeCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeModel.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeModel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.countTokens($t.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
