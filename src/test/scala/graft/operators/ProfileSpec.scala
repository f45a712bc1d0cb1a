package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FormattedMode

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, None, Some(10)),
    (3L, Some("b"), None),
    (4L, Some("a"), Some(30)))
    .toDF("id", "s", "v")

  test("profile reports rows, nulls, exact distincts, min/max per column") {
    val p = Profile.table(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("profiling N columns costs one scan, not N jobs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
    df.write.mode("overwrite").parquet(tmp)
    val plan = Profile.table(spark.read.parquet(tmp))
      .queryExecution.explainString(FormattedMode)
    assert(plan.linesIterator.count(
      _.matches("\\(\\d+\\) Scan parquet\\s*")) == 1, plan)
  }

  test("unknown columns are rejected at call time") {
    val e = intercept[IllegalArgumentException] {
      Profile.table(df, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
