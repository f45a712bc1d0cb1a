package graft.functions

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepairMojibakeSpec extends SparkSpec {
  import spark.implicits._
  import RepairMojibake.repairMojibake

  private def mangle(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)

  private def fix(s: String): String =
    Seq(Tuple1(s)).toDF("s")
      .select(repairMojibake(col("s"))).head().getString(0)

  test("UTF-8-read-as-Latin-1 text repairs back to the original, " +
      "across 2-, 3- and 4-byte sequences") {
    for (orig <- Seq("schön ä ü ß", "£10 · café", "中文 text",
        "emoji 😀 tail", "naïve résumé"))
      assert(fix(mangle(orig)) == orig, s"for '$orig'")
  }

  test("pure ASCII and genuine accented text pass through untouched") {
    assert(fix("plain ascii text") == "plain ascii text")
    // high chars but no lead+continuation signature: real Latin-1 prose
    assert(fix("naïve café résumé") == "naïve café résumé")
    assert(fix("10° über null") == "10° über null")
  }

  test("a fired signature with an invalid UTF-8 byte run passes " +
      "through (strict decode, not replacement chars)") {
    // U+00E0 U+00A4 = E0 A4 as Latin-1 bytes: a 3-byte lead missing its
    // third byte — signature fires, strict decode fails, row untouched
    val s = "x à¤ y"
    assert(fix(s) == s)
  }

  test("chars above U+00FF mean the row was never a Latin-1 read, even " +
      "when the signature would fire") {
    val s = "€ Ã¤" // € then mojibake-shaped tail
    assert(fix(s) == s)
  }

  test("doubly-mangled text undoes exactly one level per call") {
    val once = mangle("ä")
    val twice = mangle(once)
    assert(fix(twice) == once)
    assert(fix(once) == "ä")
  }

  test("nulls stay null; the expression stays inside whole-stage codegen") {
    assert(Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(repairMojibake(col("s"))).head().isNullAt(0))
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = spark.range(100)
        .select(concat(lit(mangle("ä")), col("id").cast("string")).as("s"))
        .select(repairMojibake(col("s")).as("r"))
      assert(df.collect().forall(_.getString(0).startsWith("ä")))
      assert(df.queryExecution.executedPlan.toString
        .matches("(?s).*\\*\\(\\d+\\) Project.*"),
        "repair projection not inside a WholeStageCodegen span")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
