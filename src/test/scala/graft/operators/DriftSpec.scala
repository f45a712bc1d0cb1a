package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions score ~zero PSI in every bucket") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Drift.psi(ref, ref, "v", k = 4)
      .orderBy("bucket")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1, 2, 3))
    assert(out.forall { case (_, nr, nc, _) => nr == nc })
    assert(out.forall(_._4 == 0.0))
  }

  test("a shifted current snapshot concentrates mass in the top bucket " +
      "and PSI flags it") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (1 to 1000).map(i => i.toDouble + 700).toDF("v")
    val out = Drift.psi(ref, cur, "v", k = 4)
      .orderBy("bucket")
      .as[(Int, Long, Long, Double)].collect().toSeq
    val total = out.map(_._4).sum
    assert(total > 0.25, s"PSI $total should flag a 70% shift")
    // the top reference bucket gained mass, the bottom lost all of it
    assert(out.head._3 < out.head._2)
    assert(out.last._3 > out.last._2)
  }

  test("a bucket with zero current mass clamps to eps instead of " +
      "producing infinity; nulls are ignored") {
    val ref = (1 to 100).map(i => Option(i.toDouble)).toDF("v")
    val cur = ((1 to 50).map(i => Option(i.toDouble)) :+
      Option.empty[Double]).toDF("v")
    val out = Drift.psi(ref, cur, "v", k = 2)
      .orderBy("bucket")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out.size == 2)
    assert(out(1)._3 == 0L)
    assert(!out(1)._4.isInfinity && !out(1)._4.isNaN)
    assert(out.map(_._3).sum == 50L)
  }

  test("madOutliers flags planted spikes per group, not clean rows, " +
      "and a zero-MAD group flags any deviation without dividing") {
    val base = (1 to 100).map(i => ("a", i.toLong, 50.0 + (i % 11)))
    val spike = Seq(("a", 900L, 5000.0), ("a", 901L, -4000.0))
    val const = (1 to 20).map(i => ("c", 1000L + i, 7.0)) :+
      ("c", 1021L, 9.0)
    val df = (base ++ spike ++ const).toDF("g", "id", "v")
    val out = Drift.madOutliers(df, Seq("g"), "v")
      .select("id").as[Long].collect().toSet
    assert(out == Set(900L, 901L, 1021L))
  }

  test("approx mode (exact = false): PSI within tolerance of exact, " +
      "MAD flags the same outliers, robustScale within one rank — and " +
      "exact defaults are unchanged") {
    val ref = (1 to 5000).map(i => (i * 2641 % 5003).toDouble).toDF("v")
    val cur = (1 to 5000).map(i => (i * 769 % 4999).toDouble + 800).toDF("v")
    val ex = Drift.psi(ref, cur, "v", k = 5)
      .orderBy("bucket").as[(Int, Long, Long, Double)].collect().toSeq
    val ex2 = Drift.psi(ref, cur, "v", k = 5, exact = true)
      .orderBy("bucket").as[(Int, Long, Long, Double)].collect().toSeq
    assert(ex == ex2, "exact default changed")
    val ap = Drift.psi(ref, cur, "v", k = 5, exact = false, accuracy = 10000)
      .orderBy("bucket").as[(Int, Long, Long, Double)].collect().toSeq
    // thresholds within one rank → per-bucket counts within a handful of
    // rows, PSI totals nearly identical
    ex.zip(ap).foreach { case ((b1, nr1, nc1, _), (b2, nr2, nc2, _)) =>
      assert(b1 == b2)
      assert(math.abs(nr1 - nr2) <= 5 && math.abs(nc1 - nc2) <= 5,
        s"bucket $b1 counts drifted: ($nr1,$nc1) vs ($nr2,$nc2)")
    }
    assert(math.abs(ex.map(_._4).sum - ap.map(_._4).sum) < 0.01)

    val spiky = ((1 to 200).map(i => ("a", i.toLong, 50.0 + (i % 11))) ++
      Seq(("a", 900L, 5000.0), ("a", 901L, -4000.0))).toDF("g", "id", "v")
    val exFlags = Drift.madOutliers(spiky, Seq("g"), "v")
      .select("id").as[Long].collect().toSet
    val apFlags = Drift.madOutliers(spiky, Seq("g"), "v",
      exact = false, accuracy = 10000).select("id").as[Long].collect().toSet
    assert(exFlags == apFlags && apFlags == Set(900L, 901L))

    val dense = (1 to 2000).map(i => ("g", i.toLong, (i * 37 % 2003).toDouble))
      .toDF("g", "id", "v")
    val exS = Drift.robustScale(dense, Seq("g"), "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val apS = Drift.robustScale(dense, Seq("g"), "v",
      exact = false, accuracy = 10000)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // median/IQR within one element (~1 of ~1000-wide IQR) → scaled
    // values agree to ~1e-2
    exS.foreach { case (id, v) =>
      assert(math.abs(v - apS(id)) < 0.02, s"id $id: $v vs ${apS(id)}") }
  }

  test("robustScale: hand-checked (x - median)/IQR per group; constant " +
      "group scales to 0; extremes don't move the center") {
    // group a: 1..9 -> median 5, q1 3, q3 7, iqr 4
    val a = (1 to 9).map(i => ("a", i.toLong, i.toDouble))
    // same group with a huge outlier appended: median/IQR barely move,
    // unlike mean/stddev — the property that makes the scaling robust
    val b = (1 to 9).map(i => ("b", 100L + i, i.toDouble)) :+
      ("b", 110L, 1e6)
    val c = Seq(("c", 200L, 4.0), ("c", 201L, 4.0))
    val out = Drift.robustScale((a ++ b ++ c).toDF("g", "id", "v"),
      Seq("g"), "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(5L) == 0.0 && out(1L) == -1.0 && out(9L) == 1.0)
    assert(out(200L) == 0.0 && out(201L) == 0.0, "zero-IQR group -> 0")
    // center of the contaminated group still scales near 0
    assert(math.abs(out(105L)) <= 0.5)
  }
}
