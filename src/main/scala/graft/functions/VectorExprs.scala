package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Deterministic pseudo-random hyperplanes for sign-LSH (fixed seed — the
  * same planes every run, every round, and in the DuckDB oracle, which
  * inlines them as double literals; Scala's `Double.toString` round-trips,
  * so both engines see bit-identical planes).
  */
object Hyperplanes {
  val Dim = 64
  def planes(nPlanes: Int, dim: Int = Dim): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}

/** Native sign-LSH signature: bit j = (v · plane_j >= 0), all `nPlanes` dot
  * products in ONE traversal of the vector.
  *
  * Semantics are bit-identical to the composed form
  * `(0 until n).map(j => when(dot(v, plane_j) >= 0, 1L << j).otherwise(0L)).reduce(_|_)`
  * where `dot` is the sequential `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * fold (asserted in FunctionsSpec): each plane's partial sums accumulate in
  * element order with one rounding per multiply and per add — exactly the
  * composed fold's IEEE sequence — and a malformed vector (length ≠ 64 or a
  * null element), which makes every composed dot NULL and therefore every
  * `when` take its `otherwise(0L)` branch, yields signature 0 here too.
  *
  * Why native (the (b)-tier of the custom-operator ladder): higher-order
  * lambdas run interpreted, per element, with no whole-stage codegen and no
  * CSE — the composed 24-plane signature walks the vector 24 times through
  * lambda frames and was the engine's one remaining weak spot
  * (q_embed_neardup ~17× DuckDB). This expression is a tight codegen'd
  * nPlanes×64 loop over primitive arrays.
  *
  * NULL input also yields 0 (never NULL): the composed `when` absorbs the
  * null dot into its `otherwise(0L)` branch, and the oracle's
  * `CASE … ELSE 0 END` does the same — this expression is non-nullable by
  * the same collapse.
  */
case class LshSig(child: Expression, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nPlanes >= 1 && nPlanes <= 64, "nPlanes must be in [1, 64]")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_sig"

  // plane-major flattening: plane p occupies [p*Dim, (p+1)*Dim)
  private lazy val planesFlat: Array[Double] =
    Hyperplanes.planes(nPlanes).flatten

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshSig.compute(v.asInstanceOf[ArrayData], planesFlat, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val planesRef = ctx.addReferenceObj("lshPlanes", planesFlat, "double[]")
    val cls = LshSig.getClass.getName.stripSuffix("$")
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          ${ev.value} = $cls.compute(${childGen.value}, $planesRef, $nPlanes);
        }
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

object LshSig {
  /** Hot loop shared by interpreted eval and codegen (called as a static). */
  def compute(arr: ArrayData, planesFlat: Array[Double], nPlanes: Int): Long = {
    val dim = Hyperplanes.Dim
    if (arr.numElements() != dim) return 0L // composed: null dots → all bits 0
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return 0L // composed: null element → null dots → 0
      v(j) = arr.getDouble(j)
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) {
        acc += v(i) * planesFlat(off + i) // sequential fold, composed order
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Native cosine similarity: dot, ‖a‖² and ‖b‖² in ONE traversal, then
  * `dot / (sqrt(na) * sqrt(nb))` with plain IEEE division.
  *
  * Bit-identical to the composed
  * `dot(a,b) / (sqrt(fold(a²)) * sqrt(fold(b²)))` whenever the norms are
  * non-zero (always, for real embeddings) — the three accumulators are
  * independent sequential folds in element order, exactly the composed
  * plan's arithmetic (asserted in FunctionsSpec), and it also matches
  * DuckDB's `list_cosine_similarity` (cross-engine parity established by the
  * q_cosine_topk oracle). NULL when either input is NULL, lengths differ, or
  * an element is NULL — the composed form's `zip_with` padding/propagation
  * semantics. The one deliberate divergence: a zero vector yields IEEE NaN
  * (DuckDB's behavior) where ANSI-mode `Divide` would raise DIVIDE_BY_ZERO —
  * similarity of a zero vector is genuinely undefined and NaN is the
  * portable encoding, not an error.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecCosine.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosr")
      s"""
         |java.lang.Double $r = $cls.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosine {
  /** Shared by interpreted eval and codegen; null ⇒ SQL NULL. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // composed zip_with pads with null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native IVF coarse-quantizer: the codebook cell id (= index of the
  * centroid) maximizing `(cosine(v, c_cid), cid)` lexicographically — i.e.
  * the composed `array_max(array(struct(cosine(v,c₀), 0), …)).getField("cid")`
  * with its exact tie-breaks: NaN sorts greatest and equal to itself
  * (`java.lang.Double.compare` implements precisely Spark's ordering), equal
  * sims pick the larger cid, and a malformed vector (null element / wrong
  * length ⇒ every composed sim NULL ⇒ ties broken purely by cid) yields the
  * last cell here too. Asserted ≡ composed in FunctionsSpec.
  *
  * The codebook rides in as a foldable literal evaluated once at plan time
  * (a model artifact — nlist ≈ 2^10..2^14 doubles·dim even at 100 TB) and is
  * bound via `ctx.addReferenceObj`, so assignment is one codegen'd
  * nlist×dim loop per row: no lambda frames, no per-row struct allocation.
  */
case class IvfAssign(child: Expression, codebook: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebook.nonEmpty, "codebook must be non-empty")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  // centroid norms precomputed once: sqrt of the same sequential fold the
  // composed norm() runs, so sim arithmetic stays bit-identical
  private lazy val cnorms: Array[Double] = codebook.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any =
    IvfAssign.compute(input.asInstanceOf[ArrayData], codebook, cnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("ivfCodebook", codebook, "double[][]")
    val cnRef = ctx.addReferenceObj("ivfCnorms", cnorms, "double[]")
    val cls = IvfAssign.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cls.compute($v, $cbRef, $cnRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** Native embedding-sanitation kernel: the fixed-point squared norm and the
  * non-finite flag in ONE codegen'd traversal —
  * `struct(norm2_fp BIGINT, has_nan BOOLEAN)`.
  *
  * Bit-identical to the composed pair the r12 face ran (asserted in
  * FunctionsSpec):
  *   `aggregate(v, 0L, (acc, x) -> acc + CASE nonfinite -> 0
  *      ELSE round(least(1048576.0·x², 1e15))::long)` and
  *   `exists(v, nonfinite)`
  * — per-component contributions round HALF_UP (the exact `BigDecimal`
  * discipline Spark's `round` uses, so no Math.round midpoint hazard) to
  * 2^20 grain BEFORE the integer sum: order-independent by construction,
  * capped at the exactly-representable 1e15 per component. The composed
  * form walked the vector twice through interpreted lambda frames (no
  * codegen, no CSE — 1 cpu-s for 500 vectors in BENCH_r12); this is one
  * primitive loop. NULL input yields NULL (both composed HOFs do).
  */
case class VecSanity(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("norm2_fp", LongType, nullable = false),
    StructField("has_nan", BooleanType, nullable = false)))
  // compute() returns null for a null ELEMENT even when the child itself
  // is non-nullable (e.g. vec_sanity(array(a, b))): without this override
  // nullSafeCodeGen pins isNull to FalseLiteral (breaking the generated
  // assignment) and the optimizer constant-folds isnull() to false
  // (VecCosine sets the precedent; r13 second review)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sanity"

  override def nullSafeEval(input: Any): Any =
    VecSanity.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecSanity.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sanr")
      // compute() returns null for a null ELEMENT (the composed HOFs'
      // behavior) — the generated code must propagate it into isNull or a
      // downstream GetStructField dereferences a null row (VecCosine sets
      // the precedent)
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $cls.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSanity =
    copy(child = newChild)
}

object VecSanity {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var norm2 = 0L
    var hasNan = false
    var i = 0
    while (i < n) {
      // a null element NULLs both composed HOF results — propagate
      if (arr.isNullAt(i)) return null
      val x = arr.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) {
        hasNan = true // contributes 0 to the norm
      } else {
        val d = 1048576.0 * x * x
        val capped = if (d > 1.0e15) 1.0e15 else d
        // Spark round(double) = BigDecimal HALF_UP — replicated exactly
        norm2 += java.math.BigDecimal.valueOf(capped)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(norm2, hasNan)
  }
}

/** Expression builders shared by [[GraftFunctions.register]] and
  * `GraftExtensions.injectFunction` so the SQL surface is identical on both
  * registration paths.
  */
object VectorFunctionBuilders {
  import org.apache.spark.sql.catalyst.expressions.Literal

  def lshSig(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "lsh_sig(vec, nPlanes)")
    val k = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"lsh_sig nPlanes must be an int literal, got $other")
    }
    LshSig(exprs.head, k)
  }

  def vecCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "vec_cosine(a, b)")
    VecCosine(exprs.head, exprs(1))
  }

  def vecSanity(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, "vec_sanity(vec)")
    VecSanity(exprs.head)
  }

  def ivfAssign(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "ivf_assign(vec, codebook)")
    val cb = exprs(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
        val ad = e.eval().asInstanceOf[ArrayData]
        Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
      case other => throw new IllegalArgumentException(
        s"ivf_assign codebook must be a foldable array<array<double>> literal, got $other")
    }
    IvfAssign(exprs.head, cb)
  }
}

object IvfAssign {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, codebook: Array[Array[Double]],
              cnorms: Array[Double]): Int = {
    val nlist = codebook.length
    val dim = codebook(0).length
    val n = arr.numElements()
    var valid = n == dim
    val v = new Array[Double](dim)
    if (valid) {
      var j = 0
      while (j < dim && valid) {
        if (arr.isNullAt(j)) valid = false else v(j) = arr.getDouble(j)
        j += 1
      }
    }
    // malformed vector: every composed sim is NULL, ties break by cid → last
    if (!valid) return nlist - 1
    var vn = 0.0
    var j = 0
    while (j < dim) { vn += v(j) * v(j); j += 1 }
    val normV = math.sqrt(vn)
    var bestCid = 0
    var bestSim = 0.0
    var first = true
    var cid = 0
    while (cid < nlist) {
      val c = codebook(cid)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i) * c(i); i += 1 }
      val sim = dot / (normV * cnorms(cid))
      // Spark struct-max ordering: NaN greatest & self-equal, then cid max
      if (first || java.lang.Double.compare(sim, bestSim) >= 0) {
        bestSim = sim; bestCid = cid; first = false
      }
      cid += 1
    }
    bestCid
  }
}
