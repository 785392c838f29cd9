package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ExpectsInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The minhash slot-hash family: affine universal hashing
  * `h_i(m) = ((m % P) * A(i) + B(i)) % P` over the Mersenne prime
  * P = 2^31 − 1, with fixed per-slot coefficients drawn once from a seeded
  * PRNG.
  *
  * Chosen over xxhash64-per-slot deliberately: the family is pure integer
  * arithmetic any engine computes bit-identically (remainder semantics,
  * no 64-bit overflow — |m % P| < 2^31 and A(i) < 2^31 keep every product
  * under 2^62), so the DuckDB oracle can replay the exact signature and the
  * driver's hash-compare gate covers the whole LSH pipeline, not just a
  * rows-only count. Min-wise quality is the standard (a·x+b) mod p guarantee.
  */
object MinHashFamily {
  val P: Long = 2147483647L // 2^31 - 1
  private val rnd = new scala.util.Random(8191)
  val A: Array[Long] = Array.fill(64)(1L + rnd.nextInt((P - 1).toInt).toLong)
  val B: Array[Long] = Array.fill(64)(rnd.nextInt(P.toInt).toLong)
  def slotHash(m: Long, i: Int): Long = ((m % P) * A(i) + B(i)) % P
}

/** Native Catalyst expression: k minhash slots over a pre-hashed shingle
  * array in ONE traversal.
  *
  * Semantics are bit-identical to the composed form
  * `array((0 until k).map(i => array_min(transform(ms, x => ((x % P) * A(i) + B(i)) % P))))`
  * with the [[MinHashFamily]] coefficients (asserted in FunctionsSpec).
  *
  * Why native instead of the composed built-ins (the (b)-tier choice in the
  * custom-operator ladder): higher-order lambdas are evaluated per element
  * with no whole-stage codegen and no CSE, so the composed form walks the
  * array k times through interpreted lambda frames. This expression is one
  * tight codegen'd loop — k mins per element, no per-element allocation.
  *
  * Null handling: null input → null; null elements are skipped (they cannot
  * occur from the md5-prefix staging, but skipping matches array_min's
  * null-ignoring semantics); an empty input array yields all-null slots
  * exactly like `array_min(empty)`.
  */
case class MinHashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1 && numHashes <= 64, "numHashes must be in [1, 64]")

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_slots"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val a = MinHashFamily.A
    val b = MinHashFamily.B
    val p = MinHashFamily.P
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val m = arr.getLong(j) % p
        var s = 0
        while (s < numHashes) {
          val v = (m * a(s) + b(s)) % p
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("slotA", MinHashFamily.A, "long[]")
    val bRef = ctx.addReferenceObj("slotB", MinHashFamily.B, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val boxed = ctx.freshName("boxed")
      s"""
         |long[] $mins = new long[${numHashes}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $any = true;
         |    long $h = $arr.getLong($j) % ${MinHashFamily.P}L;
         |    for (int $s = 0; $s < ${numHashes}; $s++) {
         |      long $v = ($h * $aRef[$s] + $bRef[$s]) % ${MinHashFamily.P}L;
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |}
         |Object[] $boxed = new Object[${numHashes}];
         |if ($any) {
         |  for (int $s = 0; $s < ${numHashes}; $s++) $boxed[$s] = $mins[$s];
         |}
         |${ev.value} = new $gad($boxed);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

/** Native SimHash-64: bit j of the result is the sign of the vote
  * Σ over elements h of (+1 if bit j of h set, else −1). Replaces 64
  * separate interpreted `aggregate()` folds (one per bit) with a single
  * codegen'd traversal keeping 64 counters.
  *
  * Semantics identical to the composed form in DedupOps (FunctionsSpec
  * asserts it); null elements are skipped; empty/all-null input → 0L
  * (matches the composed fold over an empty array: every vote 0, no bit
  * set); null input → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $h = $arr.getLong($j);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) != 0L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native md5 minhash over a raw text column: character `shingleLen`-grams
  * are enumerated, salted, md5'd, and min-reduced per salt in ONE traversal
  * of the string — the fused form of the composed pipeline
  * `array_min(transform(array_distinct(shingles(text)), s => md5(concat(salt, s))))`
  * per salt (bit-identical; FunctionsSpec asserts it on real and edge-case
  * rows). The fusion wins come from what the composed plan cannot avoid:
  *  - `array_distinct` is pure overhead under a min-reduce (min over
  *    duplicates = min over distinct) — skipped entirely;
  *  - per-salt `transform` passes walk the shingle array k times through
  *    interpreted lambda frames with a fresh UTF8String concat + hex string
  *    per element — here each shingle's bytes feed a reused thread-local
  *    MessageDigest (salt bytes first, no concat), and candidates compare
  *    as raw 16-byte digests (unsigned byte order == lowercase-hex order),
  *    so hex formatting happens k times per ROW, not per element.
  *
  * Empty/short texts follow the composed form's `greatest(len-4, 1)`
  * convention: at least one (possibly short or empty) shingle is always
  * hashed, so the output never contains nulls; null input → null.
  */
case class Md5MinHash(child: Expression, shingleLen: Int, salts: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleLen >= 1 && salts.nonEmpty)

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType,
    containsNull = false)
  override def prettyName: String = "md5_minhash"

  private lazy val saltBytes: Array[Array[Byte]] =
    salts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    Md5MinHash.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      shingleLen, saltBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("salts", saltBytes, "byte[][]")
    val cls = Md5MinHash.getClass.getName.stripSuffix("$") // companion static fwd
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.compute($t, $shingleLen, $saltsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHash =
    copy(child = newChild)
}

object Md5MinHash {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Hot loop shared by interpreted eval and codegen (called as a static). */
  def compute(text: org.apache.spark.unsafe.types.UTF8String,
              shingleLen: Int, saltBytes: Array[Array[Byte]]): ArrayData = {
    val md = mdLocal.get()
    val nSalts = saltBytes.length
    val nChars = text.numChars()
    val count = math.max(nChars - (shingleLen - 1), 1)
    val mins = new Array[Array[Byte]](nSalts)
    var i = 1
    while (i <= count) {
      // SQL SUBSTR semantics (codepoint-based) — identical to Column.substr
      val sub = text.substringSQL(i, shingleLen).getBytes
      var s = 0
      while (s < nSalts) {
        md.reset()
        md.update(saltBytes(s))
        md.update(sub)
        val d = md.digest()
        if (mins(s) == null || java.util.Arrays.compareUnsigned(d, mins(s)) < 0)
          mins(s) = d
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](nSalts)
    var s = 0
    while (s < nSalts) {
      val d = mins(s)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexDigits((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      out(s) = org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Native word-n-gram hash60 array: the fused form of the composed
  * decontamination gram stage
  * `array_distinct(transform(sequence(1, greatest(size(toks)-(n-1), 1)),
  *    i => hash60(concat_ws(" ", try_element_at(toks, i), …,
  *                               try_element_at(toks, i+n-1)))))`
  * where `hash60(s) = conv(substring(md5(s),1,15),16,10)` — bit-identical
  * (FunctionsSpec asserts it on the real corpus and edge shapes):
  *  - `try_element_at` past the end yields null and `concat_ws` skips nulls,
  *    so a doc shorter than n produces ONE partial gram — replicated by
  *    clipping the window;
  *  - the 15-hex-digit prefix of the md5 is the digest's first 60 bits —
  *    computed directly from the raw bytes (`b[0..6]·16 + b[7]>>>4`), no
  *    hex string, no base-16 re-parse;
  *  - `array_distinct` keeps first-occurrence order — replicated with an
  *    insertion-ordered set.
  *
  * Why native: the composed transform is an interpreted lambda allocating a
  * concat string + hex string + BigInt parse PER GRAM (~tokens per doc).
  * Here each token's UTF-8 bytes are fetched once and fed to a reused
  * thread-local MessageDigest per window — no per-gram string allocation at
  * all. Null input → null; null elements are skipped exactly like concat_ws.
  */
case class GramHash60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash60"

  override def nullSafeEval(input: Any): Any =
    GramHash60.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramHash60.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHash60 =
    copy(child = newChild)
}

object GramHash60 {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val Space = Array[Byte](' ')

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val md = mdLocal.get()
    val size = toks.numElements()
    // token bytes fetched once; null elements stay null (concat_ws skips)
    val bytes = new Array[Array[Byte]](size)
    var i = 0
    while (i < size) {
      if (!toks.isNullAt(i))
        bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val nGrams = math.max(size - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      md.reset()
      var first = true
      var k = g
      val end = math.min(g + n, size) // try_element_at beyond size → null → skipped
      while (k < end) {
        if (bytes(k) != null) {
          if (!first) md.update(Space)
          md.update(bytes(k))
          first = false
        }
        k += 1
      }
      val d = md.digest()
      // first 15 hex digits = 60 bits: 7 full bytes then the high nibble
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      seen.add(v)
      g += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** POSITIONAL variant of [[GramHash60]]: one 60-bit md5-prefix hash per
  * n-gram start position, duplicates KEPT and order = position order — the
  * form span-level dedup needs (position i of the output array is the
  * window starting at token i+1). Unlike GramHash60 there is no truncated
  * tail gram and no dedup: a document shorter than n yields an EMPTY array
  * (a partial window is not a span candidate). Same hash family as every
  * other *_hash60 face, so the DuckDB oracle replays it with the proven
  * md5-prefix comprehension minus the `list_distinct`.
  */
case class GramHash60Pos(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash60_pos"

  override def nullSafeEval(input: Any): Any =
    GramHash60Pos.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramHash60Pos.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHash60Pos =
    copy(child = newChild)
}

object GramHash60Pos {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val Space = Array[Byte](' ')

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val md = mdLocal.get()
    val size = toks.numElements()
    val nGrams = size - (n - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](size)
    var i = 0
    while (i < size) {
      if (!toks.isNullAt(i))
        bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      var first = true
      var k = g
      val end = g + n
      while (k < end) {
        if (bytes(k) != null) {
          if (!first) md.update(Space)
          md.update(bytes(k))
          first = false
        }
        k += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      out(g) = v
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native character-k-shingle hash60 array: the fused form of the minhash
  * staging projection
  * `transform(array_distinct(transform(sequence(1, greatest(length(text)-(k-1), 1)),
  *    i => text.substr(i, k))), s => hash60(s))`
  * — bit-identical (FunctionsSpec asserts it on the corpus and edge shapes):
  *  - dedup happens on the SHINGLE STRINGS before hashing, exactly like the
  *    composed `array_distinct(shingles)` (dedup-by-hash would diverge from
  *    the composed form — and the oracle — on a 60-bit prefix collision);
  *  - first-occurrence order is preserved (insertion-ordered set), matching
  *    `array_distinct` + order-preserving `transform`;
  *  - windows use SQL SUBSTR codepoint semantics via `substringSQL`, so
  *    short/empty texts yield the composed form's single (possibly empty)
  *    clipped shingle; null input → null.
  *
  * Why native: the composed staging walks the text through TWO interpreted
  * lambda passes allocating a substring, an md5 hex string, and a base-16
  * conv parse per shingle (~chars per doc) — the dominant cost of every
  * minhash pipeline (the signature itself is already native). Here each
  * distinct shingle feeds a reused thread-local MessageDigest and the 60-bit
  * prefix is read straight from the digest bytes.
  */
case class ShingleHash60(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be >= 1")

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override def nullSafeEval(input: Any): Any =
    ShingleHash60.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHash60.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val md = mdLocal.get()
    val nChars = text.numChars()
    val count = math.max(nChars - (k - 1), 1)
    // distinct on the shingle STRINGS, first-occurrence order — UTF8String
    // equals/hashCode are binary-based, so set semantics == array_distinct
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](count * 2)
    var i = 1
    while (i <= count) {
      seen.add(text.substringSQL(i, k))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      md.reset()
      md.update(it.next().getBytes)
      val d = md.digest()
      // first 15 hex digits = 60 bits: 7 full bytes then the high nibble
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      out(j) = v
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Session-level registration of graft's native expressions for sessions
  * built WITHOUT `spark.sql.extensions=graft.plans.GraftExtensions` (the
  * preferred path — Bench/Verify/tests all use the extension). Quiet no-op
  * when the functions are already present, so calling it never produces
  * SimpleFunctionRegistry replace-warnings.
  */
/** The ONE builder per SQL-surfaced native function — shared verbatim by
  * both registration paths (GraftExtensions' injectFunction and
  * GraftFunctions.register) so arity/argument validation can never drift
  * between them. Every builder validates arity with a named-signature
  * message before touching exprs(i).
  */
/** Native per-OCCURRENCE word-n-gram hash60 array with optional modulus —
  * the hashed-feature stage of the curation tier
  * ([[graft.ops.CurationOps]]). The fused form of the composed
  * `transform(windows(ft, n), g => conv(substring(md5(g),1,15),16,10) [% m])`
  * where `ft = filter(toks, t => length(t) > 0)` and `windows(ft, n)` is
  * the n-length sliding windows joined by single spaces — bit-identical
  * (FunctionsSpec asserts it on the corpus and edge shapes). Three
  * deliberate differences from [[GramHash60]]'s decontamination semantics:
  *  - per occurrence, NOT distinct — DSIR models are count-based;
  *  - empty tokens are filtered BEFORE windowing (the oracle's
  *    `list_filter` runs before its bigram comprehension, so both engines
  *    window over identical index spaces);
  *  - no clipped partial window: fewer than n tokens yields an EMPTY array
  *    (the oracle's bigram comprehension is
  *    `range(1, greatest(len(toks), 1))` — exclusive end, so the final
  *    `toks[i] || ' ' || toks[i+1]` window always has both tokens in
  *    range; see [[graft.ops.CurationOps]].gramCtes), so unigrams and
  *    bigrams can be concatenated without double-counting.
  * `m > 0` reduces each 60-bit hash mod m (hashed-feature buckets; both
  * operands non-negative, so `%` agrees across engines); `m = 0` keeps the
  * raw 60-bit value (vocabulary identity for the overlap matrix).
  *
  * Why native: the composed form walks THREE interpreted lambdas (filter,
  * window transform, hash transform) allocating a concat string, an md5
  * hex string, and a base-16 parse per gram — measured 13.7 executor-CPU
  * seconds at sf0.1 for q_dsir_weight (27× DuckDB). Here each kept token's
  * UTF-8 bytes are fetched once and fed to a reused thread-local digest.
  */
case class GramBuckets(child: Expression, n: Int, m: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  require(m >= 0, "m must be >= 0 (0 = raw 60-bit hash)")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_buckets"

  override def nullSafeEval(input: Any): Any =
    GramBuckets.compute(input.asInstanceOf[ArrayData], n, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramBuckets.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $n, ${m}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

object GramBuckets {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val Space = Array[Byte](' ')

  def compute(toks: ArrayData, n: Int, m: Long): ArrayData = {
    val size = toks.numElements()
    // filter null/empty tokens first: windows run over the KEPT list
    val kept = new Array[Array[Byte]](size)
    var nk = 0
    var i = 0
    while (i < size) {
      if (!toks.isNullAt(i)) {
        val b = toks.getUTF8String(i).getBytes
        if (b.length > 0) { kept(nk) = b; nk += 1 }
      }
      i += 1
    }
    val nGrams = math.max(nk - (n - 1), 0) // no clipped partial window
    val out = new Array[Any](nGrams)
    val md = mdLocal.get()
    var g = 0
    while (g < nGrams) {
      md.reset()
      var k = g
      while (k < g + n) {
        if (k > g) md.update(Space)
        md.update(kept(k))
        k += 1
      }
      val d = md.digest()
      // first 15 hex digits = 60 bits: 7 full bytes then the high nibble
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      out(g) = if (m > 0) v % m else v
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native robust-winnowing selection (Schleimer/Wilkerson/Aiken 2003):
  * over a positional hash array, the 1-based positions of each w-window's
  * RIGHTMOST minimum, distinct and ascending.
  *
  * Semantics are bit-identical to the composed form DedupOps.winnowCore
  * shipped through r13 (asserted in FunctionsSpec):
  * `array_sort(array_distinct(transform(sequence(1, greatest(n-w+1, 1)),
  *   i => i + size(win_i) - array_position(reverse(win_i), array_min(win_i)))))`
  * — rightmost-tie realized as first-match over the reversed window; an
  * array shorter than one window winnows whole; empty input → empty.
  *
  * Why native: the composed form allocates a slice AND a reversed copy
  * per window and walks each twice (min, then position) — O(n·w) with
  * four array allocations per element (the engine's one remaining local
  * weak-gate row, q_winnow, spent its whole 0.9 cpu-s here). This is the
  * classic monotonic-deque sliding minimum: O(n) total, zero per-window
  * allocation; popping `>=` keeps the NEWEST equal candidate, which IS
  * the rightmost-min rule. Null elements are skipped as candidates
  * (array_min's null-ignoring semantics; they cannot occur from
  * gram_hash60_pos).
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, "w must be >= 1")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowSelect.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val len = math.min(w, n) // a short array winnows whole: one window
    val nWin = math.max(n - w + 1, 1)
    val dq = new Array[Int](n) // candidate indices, values strictly rising
    var head = 0; var tail = 0
    var hi = 0 // next element to admit
    val sel = new Array[Long](nWin)
    var nSel = 0
    var lastSel = -1L
    var i = 0
    while (i < nWin) {
      var lim = i + len; if (lim > n) lim = n
      while (hi < lim) {
        if (!arr.isNullAt(hi)) {
          val v = arr.getLong(hi)
          // >= pops older equal candidates: rightmost-min tie rule
          while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
          dq(tail) = hi; tail += 1
        }
        hi += 1
      }
      while (head < tail && dq(head) < i) head += 1
      if (head < tail) {
        val s = dq(head) + 1L // 1-based, like the composed arithmetic
        // window fronts are non-decreasing, so dedup is one comparison
        if (s != lastSel) { sel(nSel) = s; nSel += 1; lastSel = s }
      }
      i += 1
    }
    val boxed = new Array[Any](nSel)
    var t = 0
    while (t < nSel) { boxed(t) = sel(t); t += 1 }
    new GenericArrayData(boxed)
  }
}

object TextFunctionBuilders {
  def minhashSlots(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "minhash_slots(hashes, k)")
    val k = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"minhash_slots k must be an int literal, got $other")
    }
    MinHashSlots(exprs.head, k)
  }

  def simhash64(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "simhash64(hashes)")
    SimHash64(exprs.head)
  }

  def md5MinHash(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "md5_minhash(text)")
    Md5MinHash(exprs.head, shingleLen = 5, salts = Seq("s1", "s2", "s3", "s4"))
  }

  def ruEnAnalyze(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "ru_en_analyze(text)")
    RuEnAnalyze(exprs.head)
  }

  def gramHash60(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "gram_hash60(toks, n)")
    val n = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"gram_hash60 n must be an int literal, got $other")
    }
    GramHash60(exprs.head, n)
  }

  def gramHash60Pos(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "gram_hash60_pos(toks, n)")
    val n = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"gram_hash60_pos n must be an int literal, got $other")
    }
    GramHash60Pos(exprs.head, n)
  }

  def winnowSelect(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "winnow_select(hashes, w)")
    val w = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"winnow_select w must be an int literal, got $other")
    }
    WinnowSelect(exprs.head, w)
  }

  def gramBuckets(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 3, "gram_buckets(toks, n, m)")
    val n = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"gram_buckets n must be an int literal, got $other")
    }
    val m = exprs(2) match {
      case Literal(i: Int, IntegerType) => i.toLong
      case Literal(l: Long, LongType) => l
      case other => throw new IllegalArgumentException(
        s"gram_buckets m must be an integer literal, got $other")
    }
    GramBuckets(exprs.head, n, m)
  }

  def shingleHash60(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "shingle_hash60(text, k)")
    val k = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"shingle_hash60 k must be an int literal, got $other")
    }
    ShingleHash60(exprs.head, k)
  }

  def textMetrics(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "text_metrics(text)")
    TextMetrics(exprs.head)
  }

  def gramStats(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "gram_stats(toks)")
    GramStats(exprs.head)
  }

  def bpeCount(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "bpe_count(text)")
    BpeCount(exprs.head)
  }

  def evalFence(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "eval_fence(expr)")
    EvalFence(exprs.head)
  }

  def phraseCount(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "phrase_count(toks, phrase)")
    val ph = exprs(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        Array.tabulate(ad.numElements())(i => ad.getUTF8String(i))
      case other => throw new IllegalArgumentException(
        s"phrase_count phrase must be a foldable array<string> literal, got $other")
    }
    PhraseCount(exprs.head, ph)
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(FunctionIdentifier("minhash_slots")) &&
        registry.functionExists(FunctionIdentifier("simhash64")) &&
        registry.functionExists(FunctionIdentifier("md5_minhash")) &&
        registry.functionExists(FunctionIdentifier("ru_en_analyze")) &&
        registry.functionExists(FunctionIdentifier("lsh_sig")) &&
        registry.functionExists(FunctionIdentifier("vec_cosine")) &&
        registry.functionExists(FunctionIdentifier("vec_sanity")) &&
        registry.functionExists(FunctionIdentifier("ivf_assign")) &&
        registry.functionExists(FunctionIdentifier("gram_hash60")) &&
        registry.functionExists(FunctionIdentifier("gram_hash60_pos")) &&
        registry.functionExists(FunctionIdentifier("gram_buckets")) &&
        registry.functionExists(FunctionIdentifier("shingle_hash60")) &&
        registry.functionExists(FunctionIdentifier("text_metrics")) &&
        registry.functionExists(FunctionIdentifier("gram_stats")) &&
        registry.functionExists(FunctionIdentifier("bpe_count")) &&
        registry.functionExists(FunctionIdentifier("phrase_count")) &&
        registry.functionExists(FunctionIdentifier("winnow_select")) &&
        registry.functionExists(FunctionIdentifier("eval_fence")) &&
        registry.functionExists(FunctionIdentifier("distinct_sorted_concat"))) return
    registry.createOrReplaceTempFunction(
      "eval_fence", TextFunctionBuilders.evalFence _, "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_slots", TextFunctionBuilders.minhashSlots _, "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", TextFunctionBuilders.simhash64 _, "built-in")
    registry.createOrReplaceTempFunction(
      "md5_minhash", TextFunctionBuilders.md5MinHash _, "built-in")
    registry.createOrReplaceTempFunction(
      "ru_en_analyze", TextFunctionBuilders.ruEnAnalyze _, "built-in")
    registry.createOrReplaceTempFunction(
      "lsh_sig", VectorFunctionBuilders.lshSig _, "built-in")
    registry.createOrReplaceTempFunction(
      "vec_cosine", VectorFunctionBuilders.vecCosine _, "built-in")
    registry.createOrReplaceTempFunction(
      "vec_sanity", VectorFunctionBuilders.vecSanity _, "built-in")
    registry.createOrReplaceTempFunction(
      "ivf_assign", VectorFunctionBuilders.ivfAssign _, "built-in")
    registry.createOrReplaceTempFunction(
      "gram_hash60", TextFunctionBuilders.gramHash60 _, "built-in")
    registry.createOrReplaceTempFunction(
      "gram_hash60_pos", TextFunctionBuilders.gramHash60Pos _, "built-in")
    registry.createOrReplaceTempFunction(
      "gram_buckets", TextFunctionBuilders.gramBuckets _, "built-in")
    registry.createOrReplaceTempFunction(
      "shingle_hash60", TextFunctionBuilders.shingleHash60 _, "built-in")
    registry.createOrReplaceTempFunction(
      "text_metrics", TextFunctionBuilders.textMetrics _, "built-in")
    registry.createOrReplaceTempFunction(
      "gram_stats", TextFunctionBuilders.gramStats _, "built-in")
    registry.createOrReplaceTempFunction(
      "bpe_count", TextFunctionBuilders.bpeCount _, "built-in")
    registry.createOrReplaceTempFunction(
      "phrase_count", TextFunctionBuilders.phraseCount _, "built-in")
    registry.createOrReplaceTempFunction(
      "winnow_select", TextFunctionBuilders.winnowSelect _, "built-in")
    registry.createOrReplaceTempFunction(
      "distinct_sorted_concat",
      AggregateFunctionBuilders.distinctSortedConcat _, "built-in")
    ()
  }
}
