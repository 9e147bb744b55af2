package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the banded hyperplane-LSH signature stage
  * (graft.ops.Similarity.lshSignature) — the last scale-path map stage that
  * previously ran as a typed `flatMap` (Deserialize→map→Serialize break).
  * Returns one `nBits`-bit bucket per table as `array<int>`; callers
  * `posexplode` it into (tbl, bucket) rows, so the whole signature stage
  * stays inside whole-stage codegen on Tungsten rows.
  *
  * The hyperplane matrix travels with the plan as a codegen reference
  * object (~nTables×nBits×dim doubles, ≈100 KB at the default 16×12×64 —
  * the same bytes the broadcast variable carried, now without a typed-map
  * closure around it).
  */
object LshKernels {
  // static entry point for doGenCode (codegen emits a direct call)
  def signatures(vec: ArrayData, planes: Array[Array[Double]],
      nTables: Int, nBits: Int): ArrayData = {
    val v = vec.toFloatArray()
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      out(t) = graft.ops.Similarity.lshSignature(v, planes, t * nBits, nBits)
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Per-table LSH bucket signatures for one embedding vector. */
case class LshSignatures(child: Expression, planes: Array[Array[Double]],
    nTables: Int, nBits: Int) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshKernels.signatures(input.asInstanceOf[ArrayData], planes, nTables, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernels.signatures($c, $planesRef, $nTables, $nBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)

  // case-class equality on Array[Array[Double]] is reference identity —
  // semantically identical expressions would never compare equal, silently
  // defeating Catalyst canonicalization / common-subexpression elimination
  // if the expression appears twice in one plan. Compare plane VALUES.
  override def equals(other: Any): Boolean = other match {
    case o: LshSignatures =>
      child == o.child && nTables == o.nTables && nBits == o.nBits &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], o.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nTables), Integer.valueOf(nBits),
      Integer.valueOf(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override def prettyName: String = "graft_lsh_signatures"
}

object LshFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def lshSignatures(c: Column, planes: Array[Array[Double]],
      nTables: Int, nBits: Int): Column =
    ColumnBridge.column(LshSignatures(ColumnBridge.expression(c), planes, nTables, nBits))
}
