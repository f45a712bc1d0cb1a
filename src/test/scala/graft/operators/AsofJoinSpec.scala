package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "A", ts("2022-01-01 10:00:00")), // before any quote -> null
    (2L, "A", ts("2022-01-01 10:00:05")), // exactly at quote q1 -> q1
    (3L, "A", ts("2022-01-01 10:00:30")), // between q1 and q2 -> q1
    (4L, "A", ts("2022-01-01 10:01:30")), // after q2 -> q2
    (5L, "B", ts("2022-01-01 10:00:30")), // other key, own quote stream
    (6L, "C", ts("2022-01-01 10:00:30"))) // key with no quotes -> null
    .toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    ("A", ts("2022-01-01 10:00:05"), 100.0), // q1
    ("A", ts("2022-01-01 10:01:00"), 101.0), // q2
    ("B", ts("2022-01-01 10:00:10"), 55.0))
    .toDF("sym", "qt", "px")

  test("asof attaches the latest quote at or before each trade per key") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt",
        Map("px" -> "px"))
      .select("trade_id", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(101.0), 5L -> Some(55.0), 6L -> None))
  }

  test("tolerance nulls matches staler than the window, keeps fresh ones") {
    // 20-second tolerance: trade 3 (25s after q1) goes stale; trade 2
    // (same instant) and trade 4 (30s... ) — compute: t4 at 10:01:30 vs
    // q2 at 10:01:00 = 30s → also stale at 20s, fresh at 60s
    val out20 = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt",
        Map("px" -> "px"), tolerance = Some("20 SECONDS"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out20 == Map(
      1L -> None, 2L -> Some(100.0), 3L -> None,
      4L -> None, 5L -> Some(55.0), 6L -> None))
    val out60 = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt",
        Map("px" -> "px"), tolerance = Some("60 SECONDS"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    // 60s keeps trade 3 (25s) and trade 4 (30s); no-quote rows stay null
    assert(out60 == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(101.0), 5L -> Some(55.0), 6L -> None))
  }

  test("left columns and row count are preserved exactly") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt",
      Map("px" -> "px"))
    assert(out.count() == 6)
    assert(out.columns.toSeq == Seq("trade_id", "sym", "t", "px"))
  }

  test("payload output name colliding with a left column is rejected") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt",
        Map("px" -> "sym"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("mismatched key column types are rejected, not silently cast") {
    val quotesIntKey = quotes.withColumn("sym", $"px".cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, quotesIntKey, Seq("sym"), "t", "qt",
        Map("px" -> "px"))
    }
    assert(e.getMessage.contains("mismatched types"))
  }
}
