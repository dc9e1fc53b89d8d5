package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature + LSH band hashes, fused into one native
  * expression.
  *
  * The composed-builtins formulation (k nested `transform`/`array_min`
  * HOFs + per-band `concat_ws`+`xxhash64`) is correct but
  * catastrophically slow at scale: HOF lambdas are interpreted, and
  * Catalyst's projection collapse inlines the shingle+hash subtree
  * into every one of the k+bands column references — re-computing the
  * shingle hashing ~48× per row with no CSE. This kernel is one pass:
  * hash each shingle once, update k running minima, then hash each
  * band of the signature. ~300× faster at sf0.1 (315 s → ~1 s).
  *
  * h_j(s) = (a_j · xxhash64(s) + b_j) mod p, p = 2^31 - 1;
  * band hash = xxhash64-style mix over the band's signature slice.
  */
object MinHashKernel {
  val P: Long = 2147483647L

  def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(k)(1 + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  /** k minhash values over the shingle array. */
  def signature(arr: ArrayData, as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        update(sig, XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L), as, bs)
      }
      i += 1
    }
    sig
  }

  private def update(sig: Array[Long], raw: Long, as: Array[Long], bs: Array[Long]): Unit = {
    val x = Math.floorMod(raw, P)
    var j = 0
    while (j < sig.length) {
      val h = Math.floorMod(x * as(j) + bs(j), P)
      if (h < sig(j)) sig(j) = h
      j += 1
    }
  }

  /** k minhash values over word n-gram shingles of a token array —
    * shingling fused into the kernel so no intermediate shingle
    * strings are materialized per row. The shingle hash equals
    * xxhash64 of the space-joined shingle string, so results are
    * interchangeable with [[signature]] over
    * TextAnalysis.shingles(text, n). */
  def signatureOfTokenShingles(arr: ArrayData, shingleN: Int,
      as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i + shingleN <= n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleN)
      var j = 0
      while (j < shingleN) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val shingle = org.apache.spark.unsafe.types.UTF8String
        .concatWs(org.apache.spark.unsafe.types.UTF8String.fromString(" "), parts: _*)
      update(sig, XxHash64Function.hash(shingle, StringType, 42L), as, bs)
      i += 1
    }
    sig
  }

  def tokenShingleBands(arr: ArrayData, shingleN: Int, as: Array[Long],
      bs: Array[Long], bands: Int): ArrayData =
    new GenericArrayData(bandHashes(signatureOfTokenShingles(arr, shingleN, as, bs), bands))

  def tokenShingleSignature(arr: ArrayData, shingleN: Int, as: Array[Long],
      bs: Array[Long]): ArrayData =
    new GenericArrayData(signatureOfTokenShingles(arr, shingleN, as, bs))

  def sigBands(arr: ArrayData, bands: Int): ArrayData =
    new GenericArrayData(bandHashes(arr.toLongArray(), bands))

  /** Band hashes: mix the r signature values of each band into one
    * long (simple xorshift-multiply mix — only intra-run consistency
    * matters, as in the reference's LSH literature usage). */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L + b
      var i = b * r
      while (i < (b + 1) * r) {
        h ^= sig(i) + 0x9E3779B97F4A7C15L + (h << 6) + (h >>> 2)
        h *= 0xC2B2AE3D27D4EB4FL
        i += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  def signatureAndBands(arr: ArrayData, as: Array[Long], bs: Array[Long],
      bands: Int): ArrayData =
    new GenericArrayData(bandHashes(signature(arr, as, bs), bands))

  def signatureOnly(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData =
    new GenericArrayData(signature(arr, as, bs))
}

private[functions] trait MinHashLike extends UnaryExpression {
  def k: Int
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** Signature only: array<long> of k minhash values. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends MinHashLike {
  @transient private lazy val (as, bs) = MinHashKernel.coeffs(k, seed)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signatureOnly(input.asInstanceOf[ArrayData], as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signatureOnly($c, $asRef, $bsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused signature + banding: array<long> of band hashes. */
case class MinHashBands(child: Expression, k: Int, bands: Int, seed: Long)
    extends MinHashLike {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
  @transient private lazy val (as, bs) = MinHashKernel.coeffs(k, seed)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signatureAndBands(input.asInstanceOf[ArrayData], as, bs, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signatureAndBands($c, $asRef, $bsRef, $bands)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused tokens → n-gram shingles → signature → band hashes. */
case class MinHashTokenBands(child: Expression, shingleN: Int, k: Int,
    bands: Int, seed: Long) extends MinHashLike {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
  @transient private lazy val (as, bs) = MinHashKernel.coeffs(k, seed)
  override def prettyName: String = "minhash_token_bands"
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.tokenShingleBands(input.asInstanceOf[ArrayData], shingleN, as, bs, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.tokenShingleBands($c, $shingleN, $asRef, $bsRef, $bands)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused tokens → n-gram shingles → signature (no banding): the
  * persisted-state shape of the incremental dedup path — signatures
  * are what the corpus index stores per document (k longs), bands
  * re-derive from them with [[MinHashKernel.bandHashes]]. */
case class MinHashTokenSignature(child: Expression, shingleN: Int, k: Int,
    seed: Long) extends MinHashLike {
  @transient private lazy val (as, bs) = MinHashKernel.coeffs(k, seed)
  override def prettyName: String = "minhash_token_signature"
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.tokenShingleSignature(input.asInstanceOf[ArrayData], shingleN, as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.tokenShingleSignature($c, $shingleN, $asRef, $bsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Band hashes of an ALREADY-COMPUTED signature array — how stored
  * signatures re-enter the LSH bucket join without re-reading text. */
case class MinHashSigBands(child: Expression, bands: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig_bands requires array<long>, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_bands"
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sigBands(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.sigBands($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column =
    ExprColumn(MinHashSignature(ExprColumn.expr(shingles), k, seed))
  def minhashTokenSignature(tokens: Column, shingleN: Int, k: Int,
      seed: Long = 42L): Column =
    ExprColumn(MinHashTokenSignature(ExprColumn.expr(tokens), shingleN, k, seed))
  def minhashSigBands(sig: Column, bands: Int): Column =
    ExprColumn(MinHashSigBands(ExprColumn.expr(sig), bands))
  def minhashBands(shingles: Column, k: Int, bands: Int, seed: Long = 42L): Column =
    ExprColumn(MinHashBands(ExprColumn.expr(shingles), k, bands, seed))
  def minhashTokenBands(tokens: Column, shingleN: Int, k: Int, bands: Int,
      seed: Long = 42L): Column =
    ExprColumn(MinHashTokenBands(ExprColumn.expr(tokens), shingleN, k, bands, seed))
}
