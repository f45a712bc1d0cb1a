package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity pin for the native Hamming distance: identical to the
  * zero-extended `zip_with` + `bit_count` + `aggregate` HOF form it
  * replaces, over adversarial word patterns (bit 63, mismatched
  * lengths, empties) and random packs.
  */
class HammingDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(coalesce(x, lit(0L))
        .bitwiseXOR(coalesce(y, lit(0L))))),
      lit(0), (acc, x) => acc + x)

  test("native distance equals the HOF form on adversarial word packs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq(0L), Seq(0L)),
      (Seq(-1L), Seq(0L)),                     // all 64 bits
      (Seq(Long.MinValue), Seq(0L)),           // bit 63 alone
      (Seq(1L, 2L, 4L), Seq(1L, 2L, 4L)),
      (Seq(1L, 2L), Seq(1L)),                  // shorter right
      (Seq(5L), Seq(5L, -1L)),                 // shorter left
      (Seq.empty[Long], Seq(-1L, 7L)),         // empty left
      (Seq.empty[Long], Seq.empty[Long])
    ) ++ (1 to 12).map(_ =>
      (Seq.fill(rnd.nextInt(4))(rnd.nextLong()),
        Seq.fill(rnd.nextInt(4))(rnd.nextLong())))
    val df = cases.toDF("a", "b")
      .select(hof(col("a"), col("b")).as("h"),
        HammingDistance.hammingNative(col("a"), col("b")).as("n"))
    val bad = df.where(not(col("h") <=> col("n"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("null propagates; wrong input type is rejected") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
      .select(HammingDistance.hammingNative(col("a"), col("b")).as("n"))
    assert(df.collect().head.isNullAt(0))
    intercept[Exception] {
      Seq(("x", "y")).toDF("a", "b")
        .select(HammingDistance.hammingNative(col("a"), col("b")))
        .collect()
    }
  }

  test("the expression participates in whole-stage codegen") {
    // parquet-backed input: a literal relation would constant-fold into
    // a LocalTableScan and hide the codegen markers
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(array(col("doc_id"), col("doc_id") * 3).as("a"),
        array(col("doc_id") + 1, col("doc_id")).as("b"))
      .select(HammingDistance.hammingNative(col("a"), col("b")).as("h"))
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("* Project") && p.contains("[codegen id :"), p)
  }
}
