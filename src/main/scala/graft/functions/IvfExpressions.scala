package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expressions for the IVF cell assignment/probe stages
  * (graft.ops.Similarity.nearestCells) — previously typed `map`/`flatMap`
  * closures over a broadcast centroid array (Deserialize→map→Serialize
  * breaks on the corpus-wide assignment scan). The centroid matrix travels
  * with the plan as a codegen reference object (nList×dim doubles — ~8 KB
  * at the default 16×64), exactly like [[LshSignatures]]' hyperplanes, and
  * both stages stay inside whole-stage codegen on Tungsten rows.
  *
  * Both delegate to Similarity.nearestCells, so cell ids are bit-identical
  * to the previous typed-map implementation (same IEEE dot-product fold
  * order, same lowest-index tie-break) — the q_ann_ivf oracle replays that
  * arithmetic exactly.
  */
object IvfKernels {
  def nearestCell(vec: ArrayData, cents: Array[Array[Double]]): Int =
    graft.ops.Similarity.nearestCells(vec.toFloatArray(), cents, 1)(0)

  def probeCells(vec: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      graft.ops.Similarity.nearestCells(vec.toFloatArray(), cents, nProbe))
}

private[functions] trait IvfCentroidExpression extends UnaryExpression {
  def cents: Array[Array[Double]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  // structural equality on the centroid matrix: case-class equality on
  // Array[Array[Double]] is reference identity, which would silently defeat
  // Catalyst canonicalization / common-subexpression elimination
  protected def centsEqual(other: Array[Array[Double]]): Boolean =
    java.util.Arrays.deepEquals(
      cents.asInstanceOf[Array[AnyRef]], other.asInstanceOf[Array[AnyRef]])

  protected def centsHash: Int =
    java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])
}

/** Nearest-centroid cell id for one vector (the IVF assignment stage). */
case class IvfNearestCell(child: Expression, cents: Array[Array[Double]])
    extends IvfCentroidExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearestCell(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.IvfKernels.nearestCell($c, $centsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfNearestCell =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: IvfNearestCell => child == o.child && centsEqual(o.cents)
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(child, Integer.valueOf(centsHash))

  override def prettyName: String = "graft_ivf_nearest_cell"
}

/** The nProbe nearest centroid cell ids for one query vector (the IVF
  * probe stage), ordered by descending dot product.
  */
case class IvfProbeCells(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends IvfCentroidExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    IvfKernels.probeCells(input.asInstanceOf[ArrayData], cents, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.IvfKernels.probeCells($c, $centsRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: IvfProbeCells => child == o.child && nProbe == o.nProbe && centsEqual(o.cents)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nProbe), Integer.valueOf(centsHash))

  override def prettyName: String = "graft_ivf_probe_cells"
}

object IvfFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def nearestCell(c: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfNearestCell(ColumnBridge.expression(c), cents))

  def probeCells(c: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(IvfProbeCells(ColumnBridge.expression(c), cents, nProbe))
}
