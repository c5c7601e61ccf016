package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_normalize(col, form)` as a native codegen'd expression:
  * Unicode canonicalization via `java.text.Normalizer` — the
  * text-canonicalization step a training-data pipeline runs BEFORE
  * fingerprint dedup, so visually-identical strings with different code
  * point sequences (composed `é` vs `e` + combining acute) collapse to
  * one fingerprint. NFC output is byte-identical to DuckDB's
  * `nfc_normalize`, which is what makes the operator oracle-checkable.
  *
  * Forms: NFC / NFD / NFKC / NFKD (validated at construction). The
  * generated code calls the JDK normalizer directly — no UDF wrapper, no
  * serialization; the only per-row cost above the JDK call is the
  * UTF8String ⇄ String round-trip, which the JDK API forces on any
  * implementation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "unicode_normalize"

  // Resolved once, not per row: the interpreted path would otherwise pay
  // a string-keyed enum lookup per value (the codegen path embeds the
  // constant anyway). Transient — Form re-derives from `form` after
  // deserialization on executors.
  @transient private lazy val resolvedForm =
    java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, resolvedForm))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($v.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  /** Column-API entry point; `form` defaults to NFC (the canonical
    * composition DuckDB's `nfc_normalize` implements).
    */
  def normalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
