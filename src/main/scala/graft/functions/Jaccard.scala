package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact n-gram-shingle Jaccard of two token arrays, fused into one
  * native expression.
  *
  * The composed-builtins verify (`array_distinct(transform(sequence…,
  * array_join(slice…)))` on BOTH sides, then `array_intersect` +
  * `array_union`) is correct but interpreted end to end: HOF lambdas
  * never enter whole-stage codegen, and the intermediate shingle
  * arrays are materialized per candidate PAIR — the r9 sf10 smoke's
  * thread dumps show exactly this subtree (`ArrayTransform`/`Slice`/
  * `ArrayJoin`/`ArrayIntersect`) dominating the minhash pair builds.
  * This kernel is one pass: shingle set A into a hash set, walk B's
  * shingles counting membership, |A∪B| = |A| + |B| − |A∩B|. String
  * equality on the exact same space-joined shingles, so results are
  * BIT-IDENTICAL to the HOF formulation (and to the DuckDB oracles) —
  * no hash-collision approximation.
  *
  * Pairs with fewer than n tokens on either side have an empty shingle
  * set: Jaccard is 0.0 when exactly one side is empty and 1.0 when
  * both are (0/0 — the HOF formulation yielded NaN→filtered; callers
  * only compare ≥ threshold after a size(toks) ≥ n filter, so the
  * case never reaches either path).
  */
object JaccardKernel {

  private val Space = UTF8String.fromString(" ")

  private def shingleAt(arr: ArrayData, i: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
    UTF8String.concatWs(Space, parts: _*)
  }

  /** Exact Jaccard |A∩B|/|A∪B| over the DISTINCT n-gram shingle sets
    * of two token arrays. */
  def tokenShingleJaccard(t1: ArrayData, t2: ArrayData, n: Int): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    val n1 = t1.numElements()
    while (i + n <= n1) { setA.add(shingleAt(t1, i, n)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    val n2 = t2.numElements()
    while (j + n <= n2) {
      val s = shingleAt(t2, j, n)
      if (seenB.add(s) && setA.contains(s)) inter += 1
      j += 1
    }
    val union = setA.size() + seenB.size() - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Distinct common elements of two string arrays —
    * `size(array_intersect(a, b))` semantics in one pass. */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String]()
    var i = 0
    val ns = small.numElements()
    while (i < ns) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String]()
    var inter = 0L
    var j = 0
    val nl = large.numElements()
    while (j < nl) {
      if (!large.isNullAt(j)) {
        val s = large.getUTF8String(j)
        if (set.contains(s) && seen.add(s)) inter += 1
      }
      j += 1
    }
    inter
  }
}

/** tokens × tokens → exact shingle Jaccard (double). */
case class TokenShingleJaccard(left: Expression, right: Expression,
    shingleN: Int) extends BinaryExpression {
  require(shingleN >= 1, s"shingleN must be >= 1: $shingleN")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_shingle_jaccard requires two array<string>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_shingle_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.tokenShingleJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardKernel.tokenShingleJaccard($a, $b, $shingleN)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** size(array_intersect(a, b)) for string arrays, one fused pass:
  * set the smaller side, probe with the larger, counting distinct
  * common elements — exactly `array_intersect`'s semantics (distinct
  * matches) without the interpreted HOF machinery or the intermediate
  * intersection array. */
case class StringArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"string_array_intersect_size requires two array<string>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "string_array_intersect_size"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.intersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardKernel.intersectSize($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object Jaccard {
  /** Exact n-gram shingle Jaccard of two token-array columns. */
  def tokenShingleJaccard(t1: Column, t2: Column, shingleN: Int): Column =
    ExprColumn(TokenShingleJaccard(
      ExprColumn.expr(t1), ExprColumn.expr(t2), shingleN))

  /** `size(array_intersect(a, b))` as one codegen'd pass (long). */
  def intersectSize(a: Column, b: Column): Column =
    ExprColumn(StringArrayIntersectSize(ExprColumn.expr(a), ExprColumn.expr(b)))
}
