package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity pin for the native token counter: bit-identical to the
  * `size(split(lower(trim(text)), "\\s+"))` idiom it replaces, over
  * adversarial whitespace shapes AND the real corpus.
  */
class TokenCountSpec extends SparkSpec {
  import spark.implicits._

  private def hofCount = (c: org.apache.spark.sql.Column) =>
    size(split(lower(trim(c)), "\\s+"))

  test("native count equals the HOF idiom on adversarial shapes") {
    val cases = Seq(
      "", " ", "   ", "a", " a ", "a b", "a  b", "  a  b  ",
      "\ta", "a\t", "\t a \t", "a\nb\r\nc", "\fx", "a",
      "tab\tsep\tcols", "mixed \t\n ws", "ünïcødé tökens",
      "日本語 テキスト", "emoji 🎉 tokens", "\r", "x\r", "\rx",
      "a b c d e f g h", "double  space", "trail  ", "  lead")
    val df = cases.toDF("t")
      .select(col("t"), hofCount(col("t")).as("hof"),
        TokenCount.tokenCountNative(col("t")).as("nat"))
    val bad = df.where(col("hof") =!= col("nat")).collect()
    assert(bad.isEmpty, bad.map(_.toString).mkString("\n"))
  }

  test("native count equals the HOF idiom over the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs
      .select(hofCount(col("text")).as("hof"),
        TokenCount.tokenCountNative(col("text")).as("nat"))
      .where(col("hof") =!= col("nat")).count()
    assert(bad == 0L)
  }

  test("null propagates and non-string input is rejected") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("t")
      .select(TokenCount.tokenCountNative(col("t")).as("n"))
    assert(df.collect().map(r =>
      if (r.isNullAt(0)) -1 else r.getInt(0)).sorted.toSeq == Seq(-1, 2))
    intercept[Exception] {
      Seq(1).toDF("x")
        .select(TokenCount.tokenCountNative(col("x"))).collect()
    }
  }

  test("the expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TokenCount.tokenCountNative(col("text")).as("n"))
    // the `*` prefix and `[codegen id : n]` tags ARE the codegen
    // markers — a non-codegen expression would print a bare `Project`
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("* Project") && p.contains("[codegen id :"), p)
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
