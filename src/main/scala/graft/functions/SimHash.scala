package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array as a native Catalyst expression.
  *
  * The naive Column formulation (64 `aggregate` HOFs over the token
  * array) is codegen-fallback and re-scans the tokens per bit; this
  * kernel is one pass per row — tokens × 64 bit-updates in a tight
  * JIT'd loop, called from whole-stage codegen.
  *
  * Token hash = xxhash64(token) with Spark's default seed 42, so the
  * signature matches what `functions.xxhash64` would produce per
  * token (useful when cross-checking in tests).
  */
object SimHashKernel {
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** Column API: 64-bit SimHash of an array<string> column. */
  def simhash64(tokens: Column): Column =
    ExprColumn(SimHash64(ExprColumn.expr(tokens)))
}
