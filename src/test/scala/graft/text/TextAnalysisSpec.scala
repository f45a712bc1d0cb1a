package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token and subword counting") {
    val r = one("Hello, world! 42 times").select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.subwordCount($"text").cast("int").as("s"))
      .as[(Int, Int)].head()
    assert(r._1 == 4)
    // Hello , world ! 42 times → 6 pieces
    assert(r._2 == 6)
  }

  test("langId picks the marker-dominant language, und on no hits") {
    val df = Seq(
      "the cat of the house and a dog",
      "der hund und die katze ist nicht da",
      "el perro y los gatos que una casa",
      "le chien et les chats dans une maison",
      "xyzzy plugh quux").toDF("text")
      .select(TextAnalysis.langId($"text").as("l"))
    assert(df.as[String].collect().toSeq ==
      Seq("en", "de", "es", "fr", "und"))
  }

  test("quality: clean prose scores higher than punctuation noise") {
    val clean = one("the quick brown fox and the lazy dog in a field of tall grass")
      .select(TextAnalysis.qualityScore($"text")).as[Double].head()
    val noisy = one("@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))")
      .select(TextAnalysis.qualityScore($"text")).as[Double].head()
    assert(clean > noisy)
    assert(clean <= 1.0 && noisy >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = Seq("Hello   World", "hello world", "hello  world!")
      .toDF("text").select(TextAnalysis.fingerprint($"text"))
      .as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
}
