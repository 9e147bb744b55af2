package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-analysis kernels that previously
  * ran as typed `Dataset.map`s (Deserialize→map→Serialize breaks in the
  * plan). Same rationale as [[Fingerprint64]]/[[Simhash64]]: these stay
  * inside whole-stage codegen so a 100 TB classification/verification
  * projection never leaves Tungsten rows.
  */
object TextKernels {
  // static entry points for doGenCode (codegen emits direct calls)
  def langId(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.ops.TextOps.classifyLang(s.toString))

  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double =
    graft.ops.Dedup.ngramJaccard(a.toString, b.toString, n)
}

/** Script-then-stopword language classifier
  * (graft.ops.TextOps.classifyLang) as a codegen'd scalar expression.
  */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_id"
}

/** Exact word-n-gram Jaccard between two texts
  * (graft.ops.Dedup.ngramJaccard) — the dedup verification kernel as a
  * codegen'd scalar, for use over an already-bounded candidate pair set.
  */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.ngramJaccard($a, $b, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ngram_jaccard"
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def langId(c: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(c)))

  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(
      NgramJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
}
