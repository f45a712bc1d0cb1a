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
    val tmp = graft.EntryKit.scratchTracked("graft_prof").toString
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

  test("keySkew: one hot key dominates the ratios") {
    import spark.implicits._
    // key 1 holds 8 rows; keys 2..5 hold 1 each -> 12 rows, 5 keys
    val rows = (Seq.fill(8)(1L) ++ Seq(2L, 3L, 4L, 5L))
      .toDF("k")
    val (nRows, nKeys, mx, mean, skew, t1, t10) =
      Profile.keySkew(rows, "k")
        .as[(Long, Long, Long, Double, Double, Double, Double)]
        .collect().head
    assert((nRows, nKeys, mx) == ((12L, 5L, 8L)))
    assert(mean == 2.4 && skew == 3.3333) // round(8·5/12, 4)
    assert(t1 == 0.666667 && t10 == 1.0) // only 5 keys: top10 = all
  }

  test("keySkew: a uniform key reads as skew 1 with a partial top-10") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => i % 20).toDF("k")
    val (nRows, nKeys, _, _, skew, t1, t10) =
      Profile.keySkew(rows, "k")
        .as[(Long, Long, Long, Double, Double, Double, Double)]
        .collect().head
    assert(nRows == 40L && nKeys == 20L && skew == 1.0)
    assert(t1 == 0.05 && t10 == 0.5) // 10 of 20 equal keys = half the rows
  }
}
