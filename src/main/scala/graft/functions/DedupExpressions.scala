package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signature kernels — same
  * rationale as [[Fingerprint64]]: a typed `Dataset.map` forces a
  * Deserialize→map→Serialize break before the signature computation; these
  * stay inside whole-stage codegen, so the map-side signature stage of a
  * 100 TB dedup never leaves Tungsten rows.
  */
object DedupKernels {
  // static entry points for doGenCode (codegen emits direct calls)
  def simhash(s: UTF8String): Long = graft.ops.Dedup.simhash(s.toString)

  def minhashSig(s: UTF8String, k: Int, shingleN: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      graft.ops.Dedup.minhashSignature(s.toString, k, shingleN))

  def bandHashes(sig: ArrayData, bands: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      graft.ops.Dedup.bandHashesOf(sig.toLongArray(), bands))

  /** All `w`-token sliding-window fingerprints of a token array, value-
    * identical to `fingerprint64(concat_ws(" ", slice(toks, i+1, w)))` for
    * every 0-based start i (PropertySpec-pinned) — WITHOUT building any
    * window string. The polynomial fingerprint distributes over
    * concatenation (h(A+B) = h(A)·31^len(B) + poly(B) mod 2^64), so each
    * token's (poly, 31^len) pair is computed once and every window is a
    * fold of w precomputed pairs: O(chars + windows·w) long multiplies
    * instead of O(windows·w·token_len) char appends plus a window-sized
    * String allocation per position — the previous shape's dominant cost.
    * Fewer than w tokens → empty array (the callers' guard semantics).
    */
  def passageFps(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val poly = new Array[Long](n)
    val pow = new Array[Long](n)
    var j = 0
    while (j < n) {
      // fingerprint() folds UTF-16 chars — decode once per token (the old
      // shape decoded every token once per covering window)
      val s = toks.getUTF8String(j).toString
      var p = 0L
      var pw = 1L
      var i = 0
      while (i < s.length) { p = 31L * p + s.charAt(i); pw *= 31L; i += 1 }
      poly(j) = p
      pow(j) = pw
      j += 1
    }
    val out = new Array[Long](n - w + 1)
    var s0 = 0
    while (s0 <= n - w) {
      var h = 1125899906842597L // fingerprint()'s H0
      var k = s0
      while (k < s0 + w) {
        if (k > s0) h = 31L * h + ' '.toInt
        h = h * pow(k) + poly(k)
        k += 1
      }
      out(s0) = h
      s0 += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** 64-bit simhash over whitespace tokens (graft.ops.Dedup.simhash). */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    DedupKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DedupKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

/** k-permutation minhash signature (graft.ops.Dedup.minhashSignature). */
case class MinhashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DedupKernels.minhashSig(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.minhashSig($c, $k, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

/** Per-band FNV fold over an already-computed signature — separated from
  * [[MinhashSig]] so the (heavy) shingling runs once and band hashes derive
  * from the materialized signature column.
  */
case class MinhashBandHashes(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DedupKernels.bandHashes(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.bandHashes($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_band_hashes"
}

/** Sliding-window passage fingerprints over a token array
  * ([[DedupKernels.passageFps]]) — the map stage of the passage-dedup
  * family, kept inside whole-stage codegen.
  */
case class PassageFps(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DedupKernels.passageFps(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.passageFps($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): PassageFps =
    copy(child = newChild)

  override def prettyName: String = "graft_passage_fps"
}

object DedupFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64(c: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(c)))

  def passageFps(c: Column, w: Int): Column =
    ColumnBridge.column(PassageFps(ColumnBridge.expression(c), w))

  def minhashSig(c: Column, k: Int, shingleN: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c), k, shingleN))

  def minhashBandHashes(c: Column, bands: Int): Column =
    ColumnBridge.column(MinhashBandHashes(ColumnBridge.expression(c), bands))
}
