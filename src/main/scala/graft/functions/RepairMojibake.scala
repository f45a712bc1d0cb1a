package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the ftfy transform): undo UTF-8 text that was read
  * as Latin-1 somewhere upstream — "ä" shipped as "Ã¤", "£" as "Â£" —
  * a defect class crawls exhibit constantly (mis-labeled HTTP charsets,
  * double-transcoding proxies). Left unrepaired it poisons tokenization
  * and splits otherwise-identical documents across dedup fingerprints.
  *
  * A row repairs only when ALL of:
  *   1. every char is ≤ U+00FF (otherwise it can't be a Latin-1 read);
  *   2. the Latin-1 signature fires — a char in [U+00C2, U+00F4] (a
  *      UTF-8 lead byte read as Latin-1) followed by one in
  *      [U+0080, U+00BF] (a continuation byte so read);
  *   3. the chars reinterpreted as Latin-1 BYTES strictly decode as
  *      UTF-8 (CodingErrorAction.REPORT — one malformed sequence and
  *      the row is deemed genuine Latin-1 text, returned untouched).
  * Anything else passes through unchanged, so the operator is safe to
  * run corpus-wide. Like HTML-entity decoding, each call undoes
  * exactly ONE encoding level; doubly-mangled text needs two passes.
  * Inherent heuristic caveat: genuine Latin-1 prose whose high chars
  * happen to form valid UTF-8 repairs spuriously — the same ambiguity
  * every encoding fixer (ftfy included) accepts, because such byte
  * runs are vanishingly rare in real text.
  *
  * A native expression (the [[UnicodeNormalize]] posture): the built-in
  * `decode(encode(…))` chain throws on malformed sequences under
  * Spark 4's strict coding action — per-row tolerance needs this
  * altitude, and the expression stays inside whole-stage codegen where
  * a Scala UDF would not.
  */
case class RepairMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = RepairMojibake.Name

  override protected def nullSafeEval(input: Any): Any =
    RepairMojibake.transform(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepairMojibake$$.MODULE$$" +
        s".transform($s);")

  override protected def withNewChildInternal(
      newChild: Expression): RepairMojibake = copy(child = newChild)
}

object RepairMojibake {

  val Name = "graft_repair_mojibake"

  /** Runtime kernel, also called from generated code. */
  def transform(s: UTF8String): UTF8String = {
    val str = s.toString
    var signature = false
    var i = 0
    while (i < str.length && !signature) {
      val c = str.charAt(i)
      if (c > 0xFF) return s // can't be a Latin-1 read
      if (c >= 0xC2 && c <= 0xF4 && i + 1 < str.length) {
        val n = str.charAt(i + 1)
        signature = n >= 0x80 && n <= 0xBF
      }
      i += 1
    }
    // finish the ≤ U+00FF scan the signature short-circuited out of
    while (i < str.length) {
      if (str.charAt(i) > 0xFF) return s
      i += 1
    }
    if (!signature) return s
    val bytes = new Array[Byte](str.length)
    var j = 0
    while (j < str.length) {
      bytes(j) = str.charAt(j).toByte
      j += 1
    }
    val dec = UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => s }
  }

  /** Column API; requires a session built with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def repairMojibake(c: Column): Column = call_function(Name, c)
}
