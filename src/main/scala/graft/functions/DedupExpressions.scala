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

object DedupFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64(c: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(c)))

  def minhashSig(c: Column, k: Int, shingleN: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c), k, shingleN))

  def minhashBandHashes(c: Column, bands: Int): Column =
    ColumnBridge.column(MinhashBandHashes(ColumnBridge.expression(c), bands))
}
