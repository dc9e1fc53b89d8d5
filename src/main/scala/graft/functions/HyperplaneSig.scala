package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature of a float vector as one native
  * expression: bit j = sign of dot(v, plane_j), packed into a long.
  *
  * Replaces nBits separate `aggregate(zip_with(...))` HOF columns —
  * which projection collapse duplicates and interprets — with a single
  * kernel pass: dim × nBits fused multiply-adds per row.
  */
object HyperplaneKernel {
  /** planes flattened row-major: planes(j*dim + i) = plane_j(i). */
  def signature(arr: ArrayData, planes: Array[Double], nBits: Int): Long = {
    val dim = planes.length / nBits
    val n = math.min(arr.numElements(), dim)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var dot = 0.0
      val off = j * dim
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def planes(dim: Int, nBits: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits * dim)(rnd.nextDouble() * 2 - 1)
  }
}

case class HyperplaneSig(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression {
  require(nBits <= 63, s"nBits=$nBits must fit a long")
  @transient private lazy val planes = HyperplaneKernel.planes(dim, nBits, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.signature(input.asInstanceOf[ArrayData], planes, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneKernel.signature($c, $planesRef, $nBits)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hyperplane {
  def hyperplaneSig(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    ExprColumn(HyperplaneSig(ExprColumn.expr(vec), dim, nBits, seed))
}
