package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical definition of the ru_en analyzer (reference:
  * etl/json/es_movies.json:4-40 — standard tokenizer, lowercase,
  * english_stop + russian_stop, possessive/light-English + light-Russian
  * stemmers). Lives in the functions package so both the native expression
  * below and the composed built-ins form in SearchOps share one source of
  * truth for the stopword lists and suffix table.
  */
object RuEnAnalyzerDef {
  /** Lucene/ES "english" stopword list (`english_stop`). */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  /** Lucene/ES `_russian_` (snowball) stopword list (`russian_stop`). */
  val RuStopwords: Seq[String] = Seq(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда", "даже",
    "ну", "вдруг", "ли", "если", "уже", "или", "ни", "быть", "был",
    "него", "до", "вас", "нибудь", "опять", "уж", "вам", "ведь", "там",
    "потом", "себя", "ничего", "ей", "может", "они", "тут", "где",
    "есть", "надо", "ней", "для", "мы", "тебя", "их", "чем", "была",
    "сам", "чтоб", "без", "будто", "чего", "раз", "тоже", "себе", "под",
    "будет", "ж", "тогда", "кто", "этот", "того", "потому", "этого",
    "какой", "совсем", "ним", "здесь", "этом", "один", "почти", "мой",
    "тем", "чтобы", "нее", "сейчас", "были", "куда", "зачем", "всех",
    "никогда", "можно", "при", "наконец", "два", "об", "другой", "хоть",
    "после", "над", "больше", "тот", "через", "эти", "нас", "про",
    "всего", "них", "какая", "много", "разве", "три", "эту", "моя",
    "впрочем", "хорошо", "свою", "этой", "перед", "иногда", "лучше",
    "чуть", "том", "нельзя", "такой", "им", "более", "всегда", "конечно",
    "всю", "между")

  /** Longest-suffix-first Russian suffix table (russian_stemmer analog). */
  val RuSuffixes: String =
    "иями|ями|ами|ыми|ими|иях|иям|ях|ах|ам|ям|ией|ием|ия|ие|ии|ию|ья|ье|ью|" +
    "его|ого|ему|ому|ых|их|ую|юю|ая|яя|ое|ее|ые|ый|ий|ой|ею|ей|ов|ев|ом|ем|" +
    "а|е|и|й|о|у|ы|ь|ю|я"
}

/** Native single-pass ru_en analyzer: tokenize (Latin+Cyrillic), strip
  * apostrophes, ё-normalize, en+ru stopword drop, en+ru light stem — the
  * fused form of the composed higher-order pipeline in
  * `SearchOps.analyzeComposed` (bit-identical; FunctionsSpec asserts it on
  * the corpus and edge rows).
  *
  * Why native: the composed form runs three nested higher-order lambdas per
  * row (split → transform → filter → transform), each evaluated per token
  * through interpreted frames with fresh UTF8String allocations, and the
  * 165-entry stopword IN-list per token. Here the patterns are compiled
  * once, the stopword set is one hash probe, and each token makes exactly
  * one pass — the expression feeds six search queries (match, fuzzy,
  * multifield, ru, terms-agg, postings build).
  *
  * Both forms run the SAME Java regex engine, which is what makes exact
  * equality achievable; the DuckDB oracles keep replaying the composed
  * (RE2-portable) semantics, which the equality spec ties to this one.
  */
case class RuEnAnalyze(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ru_en_analyze"

  override def nullSafeEval(input: Any): Any =
    RuEnAnalyze.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RuEnAnalyze.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): RuEnAnalyze =
    copy(child = newChild)
}

object RuEnAnalyze {
  import java.util.regex.Pattern
  private val SplitP = Pattern.compile("[^a-z0-9а-яё']+")
  private val QuoteP = Pattern.compile("^'+|'+$")
  private val PossP  = Pattern.compile("'s$")
  private val PluralP = Pattern.compile("([a-z]{2,}[^suoi])s$")
  private val RuStemP = Pattern.compile(s"^([а-яё]{2,}?)(${RuEnAnalyzerDef.RuSuffixes})$$")
  private val Stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    (RuEnAnalyzerDef.Stopwords ++ RuEnAnalyzerDef.RuStopwords).foreach(s.add)
    s
  }

  /** Hot loop shared by interpreted eval and codegen.
    *
    * r16 allocation diet (bit-identical by construction; FunctionsSpec's
    * native≡composed equality is the gate): one Matcher per PATTERN per
    * call, `reset(token)` per token instead of four fresh Matcher
    * allocations per token, and each rule runs only when its regex could
    * possibly match — `^'+|'+$` needs an edge apostrophe, `'s$` needs an
    * apostrophe at length−2, the plural rule needs a trailing 's', and the
    * Russian stemmer's `^([а-яё]{2,}?)(suffix)$` needs ≥3 chars starting
    * with two Cyrillic letters. Each gate is the regex's own NECESSARY
    * condition, so skipping is exactly "the regex would not have matched"
    * (the replaceAll would have returned the input unchanged).
    */
  def compute(text: UTF8String): ArrayData = {
    // same lowercase as Spark's Lower expression (UTF8String.toLowerCase)
    val lowered = text.toLowerCase.toString
    // same split semantics as Spark's StringSplit (Java regex, limit -1)
    val raw = SplitP.split(lowered, -1)
    val out = new java.util.ArrayList[Any](raw.length)
    val quoteM = QuoteP.matcher("")
    val possM = PossP.matcher("")
    val pluralM = PluralP.matcher("")
    val ruM = RuStemP.matcher("")
    @inline def isCyr(c: Char): Boolean = (c >= 'а' && c <= 'я') || c == 'ё'
    var i = 0
    while (i < raw.length) {
      val r = raw(i)
      val stripped =
        if (r.nonEmpty && (r.charAt(0) == '\'' || r.charAt(r.length - 1) == '\''))
          quoteM.reset(r).replaceAll("")
        else r
      val t = stripped.replace('ё', 'е') // returns `stripped` itself when no ё
      if (t.nonEmpty && !Stops.contains(t)) {
        val n = t.length
        val noPoss =
          if (n >= 2 && t.charAt(n - 1) == 's' && t.charAt(n - 2) == '\'')
            possM.reset(t).replaceAll("")
          else t
        val en =
          if (noPoss.nonEmpty && noPoss.charAt(noPoss.length - 1) == 's')
            pluralM.reset(noPoss).replaceAll("$1")
          else noPoss
        val stemmed =
          if (en.length >= 3 && isCyr(en.charAt(0)) && isCyr(en.charAt(1)))
            ruM.reset(en).replaceAll("$1")
          else en
        out.add(UTF8String.fromString(stemmed))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
