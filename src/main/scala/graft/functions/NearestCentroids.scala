package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-nprobe nearest centroids of a float vector (by cosine), as one
  * native expression — the assignment/probe kernel of IVF-style ANN.
  * Centroids are baked into the expression (they are small: k × dim
  * doubles), so assignment is a map-side loop with no join.
  */
object CentroidKernel {
  /** centroids flattened row-major (k × dim), L2-normalized at
    * construction so cosine reduces to a dot product. */
  def topCentroids(arr: ArrayData, centroids: Array[Double], dim: Int,
      nprobe: Int): ArrayData = {
    val k = centroids.length / dim
    val n = math.min(arr.numElements(), dim)
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * centroids(off + i); i += 1 }
      scores(c) = dot
      c += 1
    }
    val p = math.min(nprobe, k)
    val picked = new Array[Int](p)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < p) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && (scores(i) > bestScore || (scores(i) == bestScore && best == -1))) {
          best = i; bestScore = scores(i)
        }
        i += 1
      }
      used(best) = true
      picked(j) = best
      j += 1
    }
    new GenericArrayData(picked)
  }

  def normalize(centroids: Array[Array[Float]]): Array[Double] = {
    val dim = centroids.head.length
    val out = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      var norm = 0.0
      var i = 0
      while (i < dim) { val v = centroids(c)(i).toDouble; norm += v * v; i += 1 }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(c * dim + i) = centroids(c)(i) * inv; i += 1 }
      c += 1
    }
    out
  }
}

case class NearestCentroids(child: Expression, centroids: Array[Double],
    dim: Int, nprobe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.topCentroids(input.asInstanceOf[ArrayData], centroids, dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidKernel.topCentroids($c, $ref, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array[Double] equality is reference-based; compare contents so two
  // expressions over the same centroid set are CSE-able.
  override def equals(o: Any): Boolean = o match {
    case NearestCentroids(c, cent, d, p) =>
      c == child && java.util.Arrays.equals(cent, centroids) && d == dim && p == nprobe
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(centroids),
      Integer.valueOf(dim), Integer.valueOf(nprobe))
}

object Centroids {
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]],
      nprobe: Int): Column = {
    val dim = centroids.head.length
    ExprColumn(NearestCentroids(ExprColumn.expr(vec),
      CentroidKernel.normalize(centroids), dim, nprobe))
  }
}
