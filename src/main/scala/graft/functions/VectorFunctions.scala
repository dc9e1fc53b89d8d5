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
