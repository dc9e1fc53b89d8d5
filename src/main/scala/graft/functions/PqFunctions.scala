package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels for the compressed ANN path
  * (driver extension §7, similarity-search scale variant).
  *
  * A dim-d float vector is split into `m` contiguous subspaces of
  * `dsub = d/m` dims; each subspace is vector-quantized against its
  * own codebook of `k` centroids, so a vector is stored as `m` small
  * ints (codes) instead of `d` floats — an 8-32× compression of the
  * corpus at rest, which is what a 100 TB vector scan actually pays
  * for. Scoring is asymmetric (ADC): the query stays exact; per query
  * a table of dot(query_sub_j, centroid_{j,c}) is computed ONCE
  * ([[PqAdcTable]], m·k entries on the tiny broadcast side), and each
  * candidate costs O(m) table lookups ([[PqTableScore]]) instead of an
  * O(d) float loop — the standard IVF-ADC layout (Jégou et al., "
  * Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * All three kernels are native codegen expressions for the same
  * reason as [[FloatVecCosine]]: HOF lambdas fall out of whole-stage
  * codegen and get re-evaluated under projection collapse.
  *
  * Codebooks are baked into the expressions flattened row-major
  * (`[j][c][i]` → j·k·dsub + c·dsub + i): m·k·dsub doubles, tiny by
  * construction (8·16·8 = 1 KiB), exactly like the IVF centroid
  * kernel ([[NearestCentroids]]).
  */
object PqKernel {

  /** Nearest centroid per subspace by L2 distance → m int codes.
    * Vectors shorter than m·dsub are zero-padded (same convention as
    * [[CentroidKernel.topCentroids]]'s length clamp) rather than
    * faulting the whole task on one malformed row. */
  def encode(arr: ArrayData, cb: Array[Double], m: Int, dsub: Int, k: Int): ArrayData = {
    val n = arr.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * k * dsub
      val voff = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val coff = base + c * dsub
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val v = if (voff + i < n) arr.getFloat(voff + i).toDouble else 0.0
          val diff = v - cb(coff + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC table: entry j·k + c = dot(query_sub_j, centroid_{j,c}).
    * O(m·k·dsub) = O(k·d) per QUERY (queries are the broadcast side), so
    * candidates pay only O(m). */
  def adcTable(arr: ArrayData, cb: Array[Double], m: Int, dsub: Int, k: Int): ArrayData = {
    val n = arr.numElements()
    val table = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val base = j * k * dsub
      val voff = j * dsub
      var c = 0
      while (c < k) {
        val coff = base + c * dsub
        var dot = 0.0
        var i = 0
        while (i < dsub && voff + i < n) {
          dot += arr.getFloat(voff + i).toDouble * cb(coff + i); i += 1 }
        table(j * k + c) = dot
        c += 1
      }
      j += 1
    }
    new GenericArrayData(table)
  }

  /** ADC score: dot(query, decoded(codes)) / ||decoded(codes)|| via m
    * table lookups. Dividing by ||query|| is skipped deliberately — it
    * is constant per query so the per-query ranking (all any top-k
    * cares about) is unchanged; the refine step rescores with exact
    * cosine anyway. `norm2` holds baked ||centroid_{j,c}||². */
  def tableScore(table: ArrayData, codes: ArrayData, norm2: Array[Double], k: Int): Double = {
    val m = codes.numElements()
    var dot = 0.0
    var dn = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c >= 0 && c < k) { // foreign/corrupt codes: skip, don't fault
        val idx = j * k + c
        dot += table.getDouble(idx)
        dn += norm2(idx)
      }
      j += 1
    }
    if (dn == 0.0) 0.0 else dot / math.sqrt(dn)
  }

  /** ||centroid||² table aligned with the flattened codebook. */
  def centroidNorm2(cb: Array[Double], m: Int, dsub: Int, k: Int): Array[Double] = {
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val coff = j * k * dsub + c * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) { val v = cb(coff + i); s += v * v; i += 1 }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    out
  }
}

private[functions] trait PqShape {
  def m: Int
  def dsub: Int
  def k: Int
  protected def requireFloatVec(t: DataType, name: String): TypeCheckResult = t match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float>, got ${other.simpleString}")
  }
}

case class PqEncode(child: Expression, codebooks: Array[Double],
    m: Int, dsub: Int, k: Int) extends UnaryExpression with PqShape {
  override def checkInputDataTypes(): TypeCheckResult =
    requireFloatVec(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], codebooks, m, dsub, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", codebooks, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.encode($c, $ref, $m, $dsub, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def equals(o: Any): Boolean = o match {
    case PqEncode(c, cb, mm, dd, kk) => c == child &&
      java.util.Arrays.equals(cb, codebooks) && mm == m && dd == dsub && kk == k
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.util.Arrays.hashCode(codebooks), Integer.valueOf(m),
    Integer.valueOf(dsub), Integer.valueOf(k))
}

case class PqAdcTable(child: Expression, codebooks: Array[Double],
    m: Int, dsub: Int, k: Int) extends UnaryExpression with PqShape {
  override def checkInputDataTypes(): TypeCheckResult =
    requireFloatVec(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override def nullSafeEval(input: Any): Any =
    PqKernel.adcTable(input.asInstanceOf[ArrayData], codebooks, m, dsub, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", codebooks, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.adcTable($c, $ref, $m, $dsub, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def equals(o: Any): Boolean = o match {
    case PqAdcTable(c, cb, mm, dd, kk) => c == child &&
      java.util.Arrays.equals(cb, codebooks) && mm == m && dd == dsub && kk == k
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.util.Arrays.hashCode(codebooks), Integer.valueOf(m),
    Integer.valueOf(dsub), Integer.valueOf(k))
}

case class PqTableScore(left: Expression, right: Expression,
    norm2: Array[Double], k: Int) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_table_score requires (array<double>, array<int>), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_table_score"
  override def nullSafeEval(table: Any, codes: Any): Any =
    PqKernel.tableScore(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], norm2, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqn2", norm2, "double[]")
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.functions.PqKernel.tableScore($t, $c, $ref, $k)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def equals(o: Any): Boolean = o match {
    case PqTableScore(l, r, n2, kk) => l == left && r == right &&
      java.util.Arrays.equals(n2, norm2) && kk == k
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(left, right,
    java.util.Arrays.hashCode(norm2), Integer.valueOf(k))
}

object Pq {
  def pqEncode(vec: Column, codebooks: Array[Double], m: Int, dsub: Int, k: Int): Column =
    ExprColumn(PqEncode(ExprColumn.expr(vec), codebooks, m, dsub, k))
  def pqAdcTable(vec: Column, codebooks: Array[Double], m: Int, dsub: Int, k: Int): Column =
    ExprColumn(PqAdcTable(ExprColumn.expr(vec), codebooks, m, dsub, k))
  def pqTableScore(table: Column, codes: Column, norm2: Array[Double], k: Int): Column =
    ExprColumn(PqTableScore(ExprColumn.expr(table), ExprColumn.expr(codes), norm2, k))
}
