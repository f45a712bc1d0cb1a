package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Native whitespace token count — the codegen'd replacement for the
  * library's `size(split(lower(trim(text)), "\\s+"))` idiom, which
  * materializes a full token ARRAY per row (one UTF8String per token +
  * an ArrayData) only to read its length. Token counting is on the hot
  * path of every text-quality / packing / BM25 pipeline over a 100 TB
  * corpus; this expression is a single byte scan with zero allocation.
  *
  * Semantics are BIT-IDENTICAL to the idiom it replaces (pinned by
  * TokenCountSpec against the HOF form):
  *   - `trim` strips 0x20 SPACE only (Spark/DuckDB trim semantics);
  *   - `split` on `\s+` with Spark's default limit -1 keeps leading AND
  *     trailing empty fields, so the count is (maximal ASCII-\s runs in
  *     the trimmed string) + 1, and the empty string counts 1 (`split`
  *     returns `[""]`);
  *   - Java regex `\s` = [ \t\n\x0B\f\r], ASCII-only — multi-byte UTF-8
  *     code points never contain ASCII bytes, so a byte scan is exact;
  *   - `lower` cannot change token boundaries and is skipped.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.countBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TokenCount.countBytes($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenCount = copy(child = newChild)
}

object TokenCount {

  /** SQL-visible name, registered via [[graft.GraftExtensions]]. */
  val Name = "graft_token_count"

  /** Column API; requires a session built with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def tokenCountNative(text: Column): Column = call_function(Name, text)

  private def isRegexWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  /** The shared interpreted/codegen kernel: token count of the
    * space-trimmed byte sequence under Java-regex `\s+` split with
    * limit -1 (leading/trailing non-space whitespace DOES produce
    * counted empty fields — the exact `split` contract).
    */
  def countBytes(s: UTF8String): Int = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return 1 // split("") == [""]
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      if (isRegexWs(bytes(i))) {
        if (!inRun) { runs += 1; inRun = true }
      } else inRun = false
      i += 1
    }
    runs + 1
  }
}
