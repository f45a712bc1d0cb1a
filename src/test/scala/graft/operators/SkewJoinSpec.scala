package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals the plain join, hot key included") {
    // 90% of the left side lands on one key
    val left = ((1 to 900).map(i => (7L, s"p$i")) ++
      (1 to 100).map(i => (i.toLong % 20, s"q$i"))).toDF("k", "payload")
    val right = (0L to 20L).map(i => (i, s"dim$i")).toDF("rk", "attr")
    val expected = left.join(right, $"k" === $"rk").drop("rk")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    for (salts <- Seq(1, 4, 16)) {
      val got = SkewJoin.inner(left, right, "k", "rk", salts)
        .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == expected, s"salts=$salts")
    }
  }

  test("duplicate right-side rows per key multiply matches exactly as " +
      "the plain join does") {
    val left = (1 to 50).map(i => (i.toLong % 5, i)).toDF("k", "v")
    val right = Seq((0L, "a"), (0L, "b"), (1L, "c")).toDF("rk", "attr")
    val expected = left.join(right, $"k" === $"rk").drop("rk")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val got = SkewJoin.inner(left, right, "k", "rk", 8)
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(got == expected)
  }

  test("the hot key's rows spread across salted shuffle keys") {
    val left = (1 to 1000).map(i => (7L, s"p$i")).toDF("k", "payload")
    val salted = left.withColumn("__sj_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(8)).cast("int"))
    val spread = salted.groupBy("__sj_salt").count().count()
    assert(spread >= 6, s"only $spread of 8 salt values used")
  }

  test("reserved column name is rejected loudly") {
    val df = Seq((1L, "x")).toDF("k", "__sj_salt")
    intercept[IllegalArgumentException] {
      SkewJoin.inner(df, df.toDF("rk", "other"), "k", "rk", 4)
    }
  }
}
