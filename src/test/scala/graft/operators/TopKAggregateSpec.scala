package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("equals the rank-window top-k on random scores, any partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L)
      .map(i => (i % 7, i, math.rint(rnd.nextDouble() * 100) / 100))
      .toDF("g", "id", "sc")
      .repartition(13) // partial merges must not change the answer
    val agg = TopKAggregate.topKPerGroup(
        rows, col("g"), col("sc"), col("id"), k = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("sc").desc, col("id").asc)
    val win = rows.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 4)
      .select(col("g"), col("rank").cast("int"), col("id"),
        col("sc"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agg == win)
  }

  test("score ties break to the lower id, groups smaller than k emit " +
      "what they have") {
    val rows = Seq(
      (1L, 10L, 5.0), (1L, 3L, 5.0), (1L, 7L, 5.0),
      (2L, 1L, 1.0))
      .toDF("g", "id", "sc")
    val out = TopKAggregate.topKPerGroup(
        rows, col("g"), col("sc"), col("id"), k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1, 3L, 5.0), (1L, 2, 7L, 5.0), (2L, 1, 1L, 1.0)))
  }

  test("NaN scores keep the rank-window parity under any partitioning") {
    // zero-norm vectors score NaN; Double.compare's total order (NaN
    // above every real, NaN == NaN → id tie-break) must match Spark's
    // own DoubleType sort so the buffer stays partition-independent
    val rows = (1L to 60L)
      .map(i => (i % 3, i,
        if (i % 5 == 0) Double.NaN else (i % 11) * 1.0))
      .toDF("g", "id", "sc")
      .repartition(7)
    val agg = TopKAggregate.topKPerGroup(
        rows, col("g"), col("sc"), col("id"), k = 5)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4.toString)).toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("sc").desc, col("id").asc)
    val win = rows.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("g"), col("rank").cast("int"), col("id"), col("sc"))
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4.toString)).toSet
    assert(agg == win)
  }

  test("the plan aggregates without sorting the scored stream") {
    val rows = (1L to 100L).map(i => (i % 3, i, i * 0.5))
      .toDF("g", "id", "sc")
    val plan = TopKAggregate.topKPerGroup(
        rows, col("g"), col("sc"), col("id"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(!plan.contains("Sort "), plan)
    assert(!plan.contains("Window"), plan)
  }
}
