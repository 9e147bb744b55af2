package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the 64-bit polynomial document
  * fingerprint (31·h + c over UTF-16 units, graft.ops.TextOps.fingerprint).
  *
  * A typed `Dataset.map` forces a Deserialize→map→Serialize break in the
  * plan; this expression stays inside whole-stage codegen (`doGenCode`
  * emits a direct static call on the already-decoded string), so a
  * fingerprint projection over 100 TB never leaves Tungsten rows.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    graft.ops.TextOps.fingerprint(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextOps.fingerprint($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint64"
}

object GraftFunctions {

  /** Column-API form (whole-stage codegen; no typed map). */
  def fingerprint64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
  }

  val registry: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "graft_fingerprint64"),
      (children: Seq[Expression]) => Fingerprint64(children.head)),
    // graft_unicode_norm(s, form): form 0=NFC 1=NFD 2=NFKC 3=NFKD
    (FunctionIdentifier("graft_unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "graft_unicode_norm"),
      (children: Seq[Expression]) => {
        // a clear analysis-time error instead of a ClassCastException deep
        // in eval: the form must be a foldable integer literal
        def fail(msg: String) = throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            (s"graft_unicode_norm: $msg (usage: graft_unicode_norm(str, form) " +
              "with form a literal int: 0=NFC 1=NFD 2=NFKC 3=NFKD)")))
        if (children.length != 2) fail(s"expects 2 arguments, got ${children.length}")
        if (!children(1).foldable) fail("the form argument must be a literal")
        children(1).eval() match {
          case i: Int => UnicodeNorm(children.head, i)
          case other => fail(s"the form argument must be an integer literal, " +
            s"got ${children(1).dataType.simpleString} value $other")
        }
      })
  )

  /** Session-level registration (idempotent) so `expr`/SQL can resolve the
    * functions on a session that was built without the extensions class.
    */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}

/** SparkSessionExtensions entry point — the production wiring:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * library's native functions into every session at build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach(ext.injectFunction)
}
