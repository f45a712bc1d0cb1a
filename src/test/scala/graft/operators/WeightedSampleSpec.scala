package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("take equals the explicit sort-and-limit and is deterministic " +
      "across runs and partitionings") {
    val df = (1L to 1000L).map(i => (i, (i % 97 + 1).toInt)).toDF("id", "w")
    val expected = df.withColumn("skey", WeightedSample.esKey($"id", $"w"))
      .orderBy($"skey", $"id").limit(50)
      .select("id").as[Long].collect().toSeq
    val got1 = WeightedSample.take(df, "id", "w", 50)
      .select("id").as[Long].collect().toSeq
    val got2 = WeightedSample.take(df.repartition(13), "id", "w", 50)
      .select("id").as[Long].collect().toSeq
    assert(got1 == expected)
    assert(got2.sorted == expected.sorted)
  }

  test("heavier rows dominate the sample") {
    // 200 heavy rows (w=1000) among 1800 light (w=1): a 100-row sample
    // should be overwhelmingly heavy
    val df = ((1L to 200L).map(i => (i, 1000)) ++
      (201L to 2000L).map(i => (i, 1))).toDF("id", "w")
    val heavy = WeightedSample.take(df, "id", "w", 100)
      .filter($"id" <= 200).count()
    assert(heavy > 80, s"only $heavy of 100 sampled rows were heavy")
  }

  test("takePerGroup matches the single-phase per-group window") {
    val df = (1L to 600L).map(i => (i, s"g${i % 3}", (i % 31 + 1).toInt))
      .toDF("id", "grp", "w")
    val keyed = df.withColumn("skey", WeightedSample.esKey($"id", $"w"))
    val w = Window.partitionBy($"grp").orderBy($"skey", $"id")
    val expected = keyed.withColumn("rk", row_number().over(w))
      .where($"rk" <= 20).select("id", "grp")
      .as[(Long, String)].collect().sortBy(x => (x._2, x._1)).toSeq
    val got = WeightedSample.takePerGroup(df, "id", "w", Seq("grp"), 20,
        salts = 4)
      .select("id", "grp")
      .as[(Long, String)].collect().sortBy(x => (x._2, x._1)).toSeq
    assert(got == expected && got.size == 60)
  }

  test("take plans as TakeOrderedAndProject, not a global sort") {
    val df = (1L to 1000L).map(i => (i, 1)).toDF("id", "w")
    val plan = WeightedSample.take(df, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
