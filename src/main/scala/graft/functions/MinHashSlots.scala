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

/** Session-level registration of graft's native expressions for sessions
  * built WITHOUT `spark.sql.extensions=graft.plans.GraftExtensions` (the
  * preferred path — Bench/Verify/tests all use the extension). Quiet no-op
  * when the functions are already present, so calling it never produces
  * SimpleFunctionRegistry replace-warnings.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(FunctionIdentifier("minhash_slots")) &&
        registry.functionExists(FunctionIdentifier("simhash64"))) return
    registry.createOrReplaceTempFunction(
      "minhash_slots",
      { exprs: Seq[Expression] =>
        require(exprs.size == 2, "minhash_slots(hashes, k)")
        val k = exprs(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"minhash_slots k must be an int literal, got $other")
        }
        MinHashSlots(exprs.head, k)
      },
      "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64",
      { exprs: Seq[Expression] =>
        require(exprs.size == 1, "simhash64(hashes)")
        SimHash64(exprs.head)
      },
      "built-in")
    ()
  }
}
