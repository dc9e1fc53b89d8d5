package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType)` embedding columns (driver
  * extension: similarity search / embedding near-dup — SURVEY §7).
  *
  * Two implementations are provided deliberately:
  *
  *  1. [[VectorFunctions.cosineHof]] — composed from built-in
  *     higher-order functions (`zip_with` + `aggregate`). Portable,
  *     but HOF lambda evaluation is codegen-fallback in Spark, which
  *     makes it ~10× too slow for the O(n·m) similarity hot path.
  *  2. [[FloatVecDot]] / [[FloatVecCosine]] — native Catalyst
  *     expressions with `doGenCode`: a tight primitive float loop
  *     inside whole-stage codegen. This is the one used by the
  *     similarity/dedup operators.
  *
  * Accumulation is a sequential index-order double fold in both, so
  * results are deterministic and match a DuckDB oracle computing the
  * same formula.
  */
object VectorFunctions {

  /** Cosine similarity via built-in HOFs (reference baseline; prefer
    * [[cosine]] in hot paths). */
  def cosineHof(a: Column, b: Column): Column = {
    val xy = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val xx = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val yy = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    xy / (sqrt(xx) * sqrt(yy))
  }

  /** Codegen'd dot product of two float vectors. */
  def dot(a: Column, b: Column): Column = ExprColumn(FloatVecDot(ExprColumn.expr(a), ExprColumn.expr(b)))

  /** Codegen'd cosine similarity of two float vectors. */
  def cosine(a: Column, b: Column): Column = ExprColumn(FloatVecCosine(ExprColumn.expr(a), ExprColumn.expr(b)))

  /** L2 norm — sequential index-order double fold via the codegen'd
    * self-dot, so the value is deterministic and oracle-replayable. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize to a unit `array<double>` (zero vectors come back
    * as unscaled doubles rather than NaN-filled). Native one-pass
    * kernel ([[FloatVecL2Normalize]]) — a `transform` lambda dividing
    * by a norm subtree would re-evaluate the norm per ELEMENT after
    * projection collapse inlines it into the lambda body (the
    * MinHash.scala:10-24 trap, O(d²) per row); the kernel is O(2d). */
  def l2Normalize(a: Column): Column = ExprColumn(FloatVecL2Normalize(ExprColumn.expr(a)))

  /** Achlioptas sign-projection kernel (the [[FloatVecSignProject]]
    * expression): outDim sequential double folds over the float
    * vector, sign per (j, k) from the same squared-modular integer
    * hash the HOF form computes — bit-identical to the
    * `aggregate(sequence(...))` composition it replaces, but a tight
    * generated loop instead of outDim·d interpreted lambda evals
    * (ArrayAggregate is codegen-fallback; the swap took q_v4's
    * single-task projection stage from ~4 s to kernel speed). */
  def signProject(a: Column, outDim: Int): Column =
    ExprColumn(FloatVecSignProject(ExprColumn.expr(a), outDim))
}

/** Bridge Column <-> Expression (Spark 4 made the Column(expr)
  * constructor internal; [[org.apache.spark.sql.GraftBridge]] restores
  * the two conversions). */
private[graft] object ExprColumn {
  def apply(e: Expression): Column = org.apache.spark.sql.GraftBridge.column(e)
  def expr(c: Column): Expression = org.apache.spark.sql.GraftBridge.expression(c)
}

/** Explicit input-type check shared by the vector expressions
  * (`AbstractDataType`/`ExpectsInputTypes` are private[sql] in
  * Spark 4, so the check is hand-rolled). */
private[functions] object VecTypeCheck {
  def apply(name: String, left: Expression, right: Expression): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) over ArrayType(FloatType), accumulated in double in index
  * order. Null if either side is null or lengths differ. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_normalize(a): array<float> → unit-norm array<double>, two tight
  * loops (norm fold in index order, then scale). Zero-norm vectors are
  * returned as unscaled doubles (not NaN-filled) so downstream cosine
  * stays null-safe. */
case class FloatVecL2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck(prettyName, child, child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_l2_normalize"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val xi = x.getFloat(i).toDouble; ss += xi * xi; i += 1 }
    val inv = if (ss == 0.0) 1.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getFloat(i).toDouble * inv; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val xi = ctx.freshName("xi")
      val inv = ctx.freshName("inv")
      val arr = ctx.freshName("arr")
      s"""
         |final int $n = $x.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $x.getFloat($i);
         |  $ss += $xi * $xi;
         |}
         |final double $inv = ($ss == 0.0) ? 1.0 : 1.0 / java.lang.Math.sqrt($ss);
         |final double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = ((double) $x.getFloat($i)) * $inv;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sign_project(a, outDim): array<float> → array<double> of length
  * outDim; out[j] = (Σ_k a[k]·sgn(j,k)) / √outDim with the sign drawn
  * from the squared-modular hash h2(j,k) mod 2 (M = 94906249):
  * h0 = (j·131 + k·65537) mod M, h1 = (h0² + j·7919 + k) mod M,
  * h2 = (h1² + 12345) mod M — token-for-token the Column/HOF formula
  * in Similarity.signProject's original form and its DuckDB oracle.
  * The fold is sequential in k (index order) per output dim, so the
  * doubles are bit-identical to the ArrayAggregate composition. */
case class FloatVecSignProject(child: Expression, outDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck(prettyName, child, child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_sign_project"

  private val scale = 1.0 / math.sqrt(outDim.toDouble)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var k = 0
      while (k < n) {
        val h0 = (j.toLong * 131L + k.toLong * 65537L) % 94906249L
        val h1 = (h0 * h0 + j.toLong * 7919L + k.toLong) % 94906249L
        val h2 = (h1 * h1 + 12345L) % 94906249L
        val s = if (h2 % 2L == 0L) 1.0 else -1.0
        acc += x.getFloat(k).toDouble * s
        k += 1
      }
      out(j) = acc * scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val h0 = ctx.freshName("h0")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $x.numElements();
         |final double[] $out = new double[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  double $acc = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    final long $h0 = (((long) $j) * 131L + ((long) $k) * 65537L) % 94906249L;
         |    final long $h1 = ($h0 * $h0 + ((long) $j) * 7919L + ((long) $k)) % 94906249L;
         |    final long $h2 = ($h1 * $h1 + 12345L) % 94906249L;
         |    $acc += ((double) $x.getFloat($k)) * (($h2 % 2L == 0L) ? 1.0 : -1.0);
         |  }
         |  $out[$j] = $acc * ${scale}D;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine(a, b) = dot / (||a||·||b||), one fused loop. Null on null
  * input, length mismatch, or zero-norm input. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        xy += xi * yi; xx += xi * xi; yy += yi * yi
        i += 1
      }
      if (xx == 0.0 || yy == 0.0) null
      else xy / (math.sqrt(xx) * math.sqrt(yy))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $x.getFloat($i);
         |    final double $yi = (double) $y.getFloat($i);
         |    $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |  }
         |  if ($xx == 0.0 || $yy == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
