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

  def unicodeNorm(s: UTF8String, form: Int): UTF8String = {
    val f = form match {
      case 0 => java.text.Normalizer.Form.NFC
      case 1 => java.text.Normalizer.Form.NFD
      case 2 => java.text.Normalizer.Form.NFKC
      case _ => java.text.Normalizer.Form.NFKD
    }
    val str = s.toString
    // fast path: already-normalized text (the common case on clean
    // corpora) skips the rebuild
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
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

/** Unicode normalization (UAX #15, via java.text.Normalizer) as a
  * codegen'd scalar — the text-cleanup stage every published pipeline
  * runs before tokenization (decomposed accents, ligatures, fullwidth
  * forms). `form`: 0=NFC 1=NFD 2=NFKC 3=NFKD (int, so the generated
  * code carries no enum reference). Already-normalized inputs return
  * the original UTF8String — zero-copy on clean corpora.
  */
case class UnicodeNorm(child: Expression, form: Int) extends UnaryExpression {
  require(form >= 0 && form <= 3, "form: 0=NFC 1=NFD 2=NFKC 3=NFKD")
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.unicodeNorm(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.unicodeNorm($c, $form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)

  override def prettyName: String = "graft_unicode_norm"
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def langId(c: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(c)))

  /** form: "NFC" | "NFD" | "NFKC" | "NFKD" */
  def unicodeNorm(c: Column, form: String = "NFC"): Column = {
    val f = form match {
      case "NFC" => 0
      case "NFD" => 1
      case "NFKC" => 2
      case "NFKD" => 3
      case other => throw new IllegalArgumentException(s"unknown form $other")
    }
    ColumnBridge.column(UnicodeNorm(ColumnBridge.expression(c), f))
  }

  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(
      NgramJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
}
