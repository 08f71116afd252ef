package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — the first step of any web-corpus text
  * pipeline: the same visible text arrives both composed (é = U+00E9)
  * and decomposed (e + U+0301), plus singleton compatibility points
  * (Å ANGSTROM SIGN U+212B → U+00C5), and every downstream exact
  * operation — dedup digests, shingles, token equality, substring
  * windows — silently fragments unless the bytes are canonicalized
  * first. Spark ships no normalization function; a Scala UDF would
  * break the codegen span, so this is the preferred native-Expression
  * form (SURVEY.md §2.11 order). DuckDB's `nfc_normalize` replays the
  * semantics exactly, which is what makes the q_normalize_text gate
  * possible.
  *
  * Per-row, allocation-light: the common already-normalized case
  * (ASCII and most real text) is detected with `Normalizer
  * .isNormalized` and returns the input buffer untouched.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }
}
