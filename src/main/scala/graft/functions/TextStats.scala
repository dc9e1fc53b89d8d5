package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row token statistics as a native Catalyst expression.
  *
  * The Column/HOF formulation of the text-analysis operators
  * (`filter(split(trim(text)), λ)` per language, plus token count and
  * summed token length) falls out of whole-stage codegen (higher-order
  * functions are interpreted) AND defeats subexpression elimination:
  * every copy of a lambda gets fresh variable ids, so Catalyst's CSE
  * sees ~30 distinct subtrees in the language-ID CASE expression and
  * re-tokenizes the document for each — the same projection-collapse
  * trap the MinHash kernel documents (graft/functions/MinHash.scala).
  *
  * This kernel tokenizes once per row and returns
  * `[n_tokens, sum_token_len, hits_de, hits_en, hits_es, hits_fr,
  * hits_zh]` as `array<long>`. Downstream columns are plain
  * `element_at`/arithmetic/CASE over the SAME (lambda-free) subtree,
  * so codegen CSE computes the kernel once however many columns
  * reference it.
  *
  * Parity contract (the DuckDB oracles depend on it): tokens are
  * `trim(text)` split on the Java regex `\s+` with empties dropped —
  * identical to `split(trim(text), "\\s+")` + non-empty filter; token
  * length counts code points (Spark/DuckDB `length` semantics).
  */
object TokenStatsKernel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Canonical per-language stopword lists (sorted lang order). The
    * Column-level surface `graft.ext.TextAnalysis.Stopwords` derives
    * from these, so kernel and oracle can't drift apart. */
  val Langs: Array[String] = Array("de", "en", "es", "fr", "zh")
  val StopwordLists: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))
  private val Sets: Array[java.util.HashSet[String]] = Langs.map { l =>
    val s = new java.util.HashSet[String]()
    StopwordLists(l).foreach(s.add)
    s
  }

  def stats(text: UTF8String): ArrayData = {
    val out = new Array[Long](2 + Langs.length)
    val s = text.toString.trim
    if (s.nonEmpty) {
      val toks = Ws.split(s)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (!t.isEmpty) {
          out(0) += 1
          out(1) += t.codePointCount(0, t.length)
          var l = 0
          while (l < Sets.length) {
            if (Sets(l).contains(t)) out(2 + l) += 1
            l += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStatsKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling-hash fingerprint, fused: the Column formulation
  * (`aggregate(split(text, ""), ...)`) materializes a per-character
  * string array and folds it interpreted; this walks the code points
  * directly. Same recurrence as the DuckDB `list_reduce(ord(c))`
  * oracle: h ← (h·31 + codepoint) mod (2³¹−1), every step in BIGINT
  * range. */
object FingerprintKernel {
  final val Mod = 2147483647L
  def fingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"
  override def nullSafeEval(input: Any): Any =
    FingerprintKernel.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintKernel.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles, fused. The Column formulation
  * (`transform(sequence(0, size-n), i -> array_join(slice(t,i+1,n)))`)
  * is a lambda HOF: interpreted, CSE-defeated (fresh lambda ids per
  * copy), and it re-walks the token array per shingle through generic
  * ArrayData. This tokenizes once and emits the joined n-grams in one
  * pass — the hot inner loop of decontamination (n=8 over the full
  * corpus) and n-gram Jaccard.
  *
  * Parity contract (DuckDB oracles): tokens = trim + split `\s+`,
  * empties dropped; shingle = n consecutive tokens joined with a
  * single space; fewer than n tokens → empty array. Bit-identical to
  * the Column formulation it replaces. */
object ShingleKernel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = Ws.split(s)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${child.dataType.simpleString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  /** Column API: `[n_tokens, sum_token_len, hits_de.. hits_zh]`. */
  def tokenStats(text: Column): Column = ExprColumn(TokenStats(ExprColumn.expr(text)))
  /** Column API: rolling-hash document fingerprint. */
  def fingerprint(text: Column): Column = ExprColumn(PolyFingerprint(ExprColumn.expr(text)))
  /** Column API: word n-gram shingles joined with single spaces. */
  def shingles(text: Column, n: Int): Column = ExprColumn(WordShingles(ExprColumn.expr(text), n))
}
