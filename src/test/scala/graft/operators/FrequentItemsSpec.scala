package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("capacity beyond the distinct count gives exact counts") {
    val df = (1 to 1000).map(i => s"w${i % 17}").toDF("w")
    val got = FrequentItems.topItems(df, $"w", capacity = 64)
      .as[(String, Long)].collect().toSeq
    val exact = df.groupBy("w").count()
      .orderBy($"count".desc, $"w")
      .as[(String, Long)].collect().toSeq
    assert(got == exact)
  }

  test("guarantee: every item above n/(capacity+1) survives and " +
      "estimates never exceed true counts") {
    // zipf-ish: one dominant item among long-tail noise
    val rows = Seq.fill(3000)("hot") ++
      (1 to 6000).map(i => s"tail${i % 2000}")
    val n = rows.size
    val cap = 20
    val df = rows.toDF("w").repartition(8)
    val got = FrequentItems.topItems(df, $"w", capacity = cap)
      .as[(String, Long)].collect().toMap
    val trueCounts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // the hot item's frequency (3000) > n/(cap+1) (~428): must survive
    assert(got.contains("hot"))
    for ((item, est) <- got) {
      val t = trueCounts(item)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(est >= t - n / (cap + 1), s"$item undershot the bound")
    }
  }

  test("per-group sketches are exact per group when capacity fits") {
    val df = (1 to 900).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, s"w${i % (if (g == "a") 5 else 11)}")
    }.toDF("g", "w")
    val got = FrequentItems.topItemsPerGroup(df, Seq("g"), $"w", capacity = 32)
      .as[(String, String, Long)].collect().toSeq
    val exact = df.groupBy("g", "w").count()
      .orderBy($"g", $"count".desc, $"w")
      .as[(String, String, Long)].collect().toSeq
    assert(got == exact)
  }

  test("counter count stays within capacity regardless of partitioning") {
    val rows = (1 to 5000).map(i => s"k$i")
    for (parts <- Seq(1, 7)) {
      val got = FrequentItems.topItems(
        rows.toDF("w").repartition(parts), $"w", capacity = 10)
      assert(got.count() <= 10)
    }
  }
}
