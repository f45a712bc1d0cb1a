package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode canonicalization — the text-normalization pass every
  * multilingual corpus runs before tokenization/dedup (NFC so composed
  * and decomposed spellings of the same grapheme hash identically;
  * NFKC to additionally fold compatibility forms; accent stripping for
  * fingerprinting and boundary-free matching).
  *
  * Spark has no normalization built-in, so the lattice of workarounds
  * is a Scala UDF (serialization + no codegen) — this expression
  * instead participates in whole-stage codegen, delegating to
  * `java.text.Normalizer` (JDK, locale-independent, deterministic).
  * Accent stripping is NFD + drop-nonspacing-marks + re-NFC, matching
  * the behavior of warehouse `strip_accents` functions on Latin text.
  */
case class UnicodeNormalize(
    child: Expression, form: String, stripMarks: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String =
    if (stripMarks) "graft_strip_accents" else s"graft_${form.toLowerCase}"

  // validate eagerly so a bad form fails at expression construction,
  // not per-row
  @transient private lazy val javaForm: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.transform(
      input.asInstanceOf[UTF8String], javaForm, stripMarks)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", javaForm,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeNormalize$$.MODULE$$" +
        s".transform($s, $formRef, $stripMarks);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  val NfcName = "graft_nfc"
  val NfkcName = "graft_nfkc"
  val StripAccentsName = "graft_strip_accents"

  /** Runtime kernel, also called from generated code. */
  def transform(s: UTF8String, form: Normalizer.Form,
      stripMarks: Boolean): UTF8String = {
    val str = s.toString
    if (!stripMarks) {
      // normalize() scans-and-returns-identity for already-normal
      // input, so the common (ASCII/NFC) path allocates nothing
      UTF8String.fromString(Normalizer.normalize(str, form))
    } else {
      val d = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val c = d.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(Normalizer.normalize(sb.toString, form))
    }
  }

  /** Column APIs; require a session built with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def nfc(c: Column): Column = call_function(NfcName, c)
  def nfkc(c: Column): Column = call_function(NfkcName, c)
  def stripAccents(c: Column): Column = call_function(StripAccentsName, c)
}
