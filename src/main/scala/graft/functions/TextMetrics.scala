package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text metrics: ONE traversal of the text computes every
  * counter the quality-score / language-ID / token-count operators need —
  * the fused form of six independent `regexp_count` passes plus a
  * `split(\s+)` size:
  *
  *   struct(
  *     n_chars     = length(text)                       — code points
  *     n_tokens    = size(split(trim(text), "\s+"))     (0 when trim empty)
  *     bpe_tokens  = regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
  *     punct       = regexp_count(text, "[^A-Za-z0-9\s]")
  *     stop_hits   = regexp_count(lower(text), "\b(the|a|an|and|or|of|in|to|is)\b")
  *     en_hits     = regexp_count(lower(text), "\b(the|and|of|is|to)\b")
  *     de_hits     = …(der|die|und|das|ist)   fr_hits = …(le|et|les|des|est)
  *     es_hits     = …(el|los|las|una|es)
  *     cjk_hits    = regexp_count(text, "[\x{4e00}-\x{9fff}]"))
  *
  * Bit-identical to the composed forms (FunctionsSpec + PropertySpec):
  *  - Java/RE2 `\b` is ASCII-defined (`\w` = [A-Za-z0-9_]), so a
  *    word-alternation pattern matches exactly when a MAXIMAL ASCII-word run
  *    equals one of the alternatives — replicated by accumulating runs of
  *    [A-Za-z0-9_] and set-matching on run end (ASCII-lowered, so it equals
  *    the composed `lower(text)` semantics for these ASCII-only sets).
  *    ACCEPTED DIVERGENCE (the md5_minhash-null kind): code points whose
  *    UNICODE lowercase is ASCII — U+212A KELVIN SIGN → 'k', U+0130 İ → 'i' —
  *    are word characters after the composed form's `lower(text)` but
  *    non-word here ("Kis" with a Kelvin K: composed sees word "kis",
  *    native sees punct + word "is"). The native ASCII-only word model is
  *    the pinned behavior (FunctionsSpec Kelvin-sign case) — consistent
  *    with `\b`/`\w` being ASCII-defined in the very patterns this
  *    replicates, and no real curation corpus spells Kelvin with U+212A;
  *  - n_tokens replicates Spark's exact split semantics: `trim` strips
  *    SPACES only (not tabs/newlines) and `split(.., "\s+")` uses limit -1,
  *    which KEEPS leading/trailing empty strings — so the size is
  *    (# of maximal \s runs inside the space-trimmed bounds) + 1, and 0 when
  *    the space-trimmed text is empty;
  *  - bpe alternation order ([A-Za-z]+ first, then [0-9]+, then any other
  *    single non-space char) decomposes a run like "ab12" into 2 tokens —
  *    replicated with separate alpha/digit run tracking ('_' is OTHER here
  *    but a word char for `\b`, hence the two run definitions);
  *  - punct counts every code POINT outside ASCII alnum+whitespace (so
  *    non-ASCII letters count — the composed pattern's documented ASCII
  *    behavior) and cjk counts code points in the CJK unified block;
  *    iteration is by code point, so astral-plane symbols count once.
  *
  * Why native: six regex passes × Java regex on every document was the
  * dominant cost of the curation gate (q_filter_chain, q_quality_score,
  * q_lang_id at ~3× DuckDB's RE2). Null input → null.
  */
case class TextMetrics(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = TextMetrics.schema
  override def prettyName: String = "text_metrics"

  override def nullSafeEval(input: Any): Any =
    TextMetrics.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextMetrics.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextMetrics =
    copy(child = newChild)
}

object TextMetrics {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("en_hits", IntegerType, nullable = false),
    StructField("de_hits", IntegerType, nullable = false),
    StructField("fr_hits", IntegerType, nullable = false),
    StructField("es_hits", IntegerType, nullable = false),
    StructField("cjk_hits", IntegerType, nullable = false)))

  private val StopSet = Set("the", "a", "an", "and", "or", "of", "in", "to", "is")
  private val EnSet = Set("the", "and", "of", "is", "to")
  private val DeSet = Set("der", "die", "und", "das", "ist")
  private val FrSet = Set("le", "et", "les", "des", "est")
  private val EsSet = Set("el", "los", "las", "una", "es")
  private val MaxWord = 3 // longest word across the five sets

  private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isAlpha(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var nChars, nTokens, bpe, punct, stop, en, de, fr, es, cjk = 0
    // space-trimmed bounds for n_tokens (trim strips ' ' only, char-level —
    // ' ' is a single code unit, so char indices are safe here)
    var t0 = 0
    var t1 = s.length - 1
    while (t0 <= t1 && s.charAt(t0) == ' ') t0 += 1
    while (t1 >= t0 && s.charAt(t1) == ' ') t1 -= 1
    // run state
    var wsRuns = 0                   // maximal \s runs inside [t0, t1]
    var inWsRun = false
    var inAlpha, inDigit = false     // bpe alpha / digit runs
    val word = new java.lang.StringBuilder(MaxWord + 1)
    var wordLive = false             // inside a [A-Za-z0-9_] run
    var wordOverflow = false         // run longer than any set word

    def endWord(): Unit = {
      if (wordLive && !wordOverflow) {
        val w = word.toString
        if (StopSet.contains(w)) stop += 1
        if (EnSet.contains(w)) en += 1
        if (DeSet.contains(w)) de += 1
        if (FrSet.contains(w)) fr += 1
        if (EsSet.contains(w)) es += 1
      }
      wordLive = false; wordOverflow = false; word.setLength(0)
    }

    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      val ws = isAsciiWs(cp)
      val alpha = isAlpha(cp)
      val digit = isDigit(cp)
      val wordCh = alpha || digit || cp == '_'
      // n_tokens: count \s runs inside the space-trimmed bounds; the
      // split-with-kept-empties size is (runs + 1)
      if (i >= t0 && i <= t1) {
        if (ws) { if (!inWsRun) { wsRuns += 1; inWsRun = true } }
        else inWsRun = false
      }
      // bpe: alpha runs, digit runs, then every other non-ws char singly
      if (alpha) { if (!inAlpha) { bpe += 1; inAlpha = true }; inDigit = false }
      else if (digit) { if (!inDigit) { bpe += 1; inDigit = true }; inAlpha = false }
      else { inAlpha = false; inDigit = false; if (!ws) bpe += 1 }
      // punct: any code point outside ASCII alnum + ASCII whitespace
      if (!ws && !alpha && !digit) punct += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      // \b word runs: [A-Za-z0-9_], ASCII-lowered for the ASCII-only sets
      if (wordCh) {
        if (!wordLive) wordLive = true
        if (!wordOverflow) {
          if (word.length() >= MaxWord) wordOverflow = true
          else word.append(if (alpha) (cp | 0x20).toChar else cp.toChar)
        }
      } else endWord()
      i += Character.charCount(cp)
    }
    endWord()
    nTokens = if (t0 > t1) 0 else wsRuns + 1
    new GenericInternalRow(Array[Any](nChars, nTokens, bpe, punct, stop, en, de, fr, es, cjk))
  }
}
