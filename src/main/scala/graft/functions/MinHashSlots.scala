package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ExpectsInputTypes, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: k minhash slots over a pre-hashed shingle
  * array in ONE traversal.
  *
  * Semantics are bit-identical to the composed form
  * `array((1 to k).map(i => array_min(transform(hashes, x => xxhash64(lit(i), x)))))`
  * (asserted in FunctionsSpec): slot i's hash of element h is Spark's
  * xxhash64 of the row (int i, long h) with the default seed 42, i.e.
  * `XXH64.hashLong(h, XXH64.hashInt(i, 42))` — the per-slot seed is
  * precomputed once at construction.
  *
  * Why native instead of the composed built-ins (the (b)-tier choice in the
  * custom-operator ladder): higher-order lambdas are evaluated per element
  * with no whole-stage codegen and no CSE, so the composed form walks the
  * array k times through interpreted lambda frames. This expression is one
  * tight codegen'd loop — k mins per element, no per-element allocation.
  *
  * Null handling: null input → null; null elements are skipped (they cannot
  * occur from `transform(_, xxhash64)` staging, but skipping matches
  * array_min's null-ignoring semantics); an empty input array yields all-null
  * slots exactly like `array_min(empty)`.
  */
case class MinHashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1 && numHashes <= 64, "numHashes must be in [1, 64]")

  private val slotSeeds: Array[Long] =
    (1 to numHashes).map(i => XXH64.hashInt(i, 42L)).toArray

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_slots"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val h = arr.getLong(j)
        var s = 0
        while (s < numHashes) {
          val v = XXH64.hashLong(h, slotSeeds(s))
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
    val seedsRef = ctx.addReferenceObj("slotSeeds", slotSeeds, "long[]")
    val xxh = classOf[XXH64].getName
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
         |    long $h = $arr.getLong($j);
         |    for (int $s = 0; $s < ${numHashes}; $s++) {
         |      long $v = $xxh.hashLong($h, $seedsRef[$s]);
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
