package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._
  import UnicodeNormalize.{nfc, nfkc, stripAccents}

  test("nfc composes decomposed graphemes; already-NFC text is identity") {
    val decomposed = "ábc" // a + combining acute: 4 codepoints
    val composed = "ábc"    // á precomposed: 3 codepoints
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain"))
      .toDF("id", "s")
    val out = df.select(col("id"), nfc(col("s")).as("n"),
      length(col("s")).as("l0"), length(nfc(col("s"))).as("l1"))
      .orderBy("id").as[(Long, String, Int, Int)].collect().toSeq
    assert(out(0)._2 == composed && out(0)._3 == 4 && out(0)._4 == 3)
    assert(out(1)._2 == composed && out(1)._4 == 3)
    assert(out(2)._2 == "plain")
  }

  test("nfkc folds compatibility forms NFC leaves alone") {
    // U+FB01 = fi ligature; U+2460 = circled one
    val (asNfc, asNfkc) = Seq(("ﬁle ①"))
      .toDF("s")
      .select(nfc(col("s")), nfkc(col("s")))
      .as[(String, String)].head()
    assert(asNfc == "ﬁle ①")
    assert(asNfkc == "file 1")
  }

  test("stripAccents removes marks from composed and decomposed " +
      "spellings alike and leaves ASCII untouched; nulls stay null") {
    val df = Seq(
      (1L, Option("café näive ñ")), // é composed, a+diaeresis decomposed, ñ
      (2L, Option("ascii only")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val out = df.select(col("id"), stripAccents(col("s")).as("p"))
      .orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(out(0)._2.contains("cafe naive n"))
    assert(out(1)._2.contains("ascii only"))
    assert(out(2)._2.isEmpty)
  }

  test("the expression stays inside whole-stage codegen") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      // a Janino failure must surface as an error, not a quiet
      // interpreted fallback
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = spark.range(100)
        .select(concat(lit("x́"), col("id").cast("string")).as("s"))
        .select(nfc(col("s")).as("n"))
      assert(df.collect().length == 100)
      assert(df.queryExecution.executedPlan.toString
        .matches("(?s).*\\*\\(\\d+\\) Project.*"),
        "normalize projection not inside a WholeStageCodegen span")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
