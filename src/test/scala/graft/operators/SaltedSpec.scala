package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup equals the single-phase window rank exactly, " +
      "across salts, including under-cap groups") {
    val rnd = new scala.util.Random(17)
    // skewed: group a has 500 rows, b has 40, c has 3 (< k)
    val df = (
      (1 to 500).map(i => (i.toLong, "a")) ++
        (501 to 540).map(i => (i.toLong, "b")) ++
        (541 to 543).map(i => (i.toLong, "c")))
      .map { case (id, g) => (id, g, rnd.nextInt(1000)) }
      .toDF("id", "grp", "x")
    val order = Seq(md5($"id".cast("string")), $"id")
    val w = Window.partitionBy($"grp").orderBy(order: _*)
    val single = df.withColumn("rk", row_number().over(w))
      .where($"rk" <= 10)
      .select("id", "grp", "rk").as[(Long, String, Int)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    for (salts <- Seq(1, 4, 64)) {
      val two = Salted.topKPerGroup(df, Seq("grp"), order, k = 10,
          salts = salts)
        .select("id", "grp", "rk").as[(Long, String, Int)]
        .collect().sortBy(r => (r._2, r._3)).toSeq
      assert(two == single, s"salts=$salts")
    }
    // the under-cap group keeps all its rows
    assert(single.count(_._2 == "c") == 3)
  }

  test("topKPerGroup ranks by DESCENDING keys via explicit saltCols") {
    val df = (1L to 200L).map(i => (i, (i % 3).toString, (i * 37 % 101).toInt))
      .toDF("id", "grp", "score")
    val order = Seq($"score".desc, $"id")
    val w = Window.partitionBy($"grp").orderBy(order: _*)
    val single = df.withColumn("rk", row_number().over(w)).where($"rk" <= 5)
      .select("id", "grp", "rk").as[(Long, String, Int)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    val two = Salted.topKPerGroup(df, Seq("grp"), order, k = 5,
        saltCols = Seq($"score", $"id"))
      .select("id", "grp", "rk").as[(Long, String, Int)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    assert(two == single && two.nonEmpty)
  }

  test("topKPerGroup rejects colliding input column names loudly") {
    val df = Seq((1L, "a", 2)).toDF("id", "grp", "rk")
    val e = intercept[IllegalArgumentException] {
      Salted.topKPerGroup(df, Seq("grp"), Seq($"id"), k = 1)
    }
    assert(e.getMessage.contains("rk"))
  }

  test("salted countDistinct equals the plain aggregate") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val got = Salted.countDistinct(df, Seq("k"), "v", salts = 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
