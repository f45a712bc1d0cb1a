package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("en", "a"), ("en", "a"), ("en", "a"), // class of 3: safe at k=3
    ("en", "b"), ("en", "b"),              // class of 2: at risk
    ("fr", "a")                            // singleton: at risk
  ).toDF("lang", "src")

  test("audit flags every class below k and only those") {
    val out = Privacy.kAnonymityAudit(rows, Seq("lang", "src"), k = 3)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("en", "a")) == ((3L, false)))
    assert(out(("en", "b")) == ((2L, true)))
    assert(out(("fr", "a")) == ((1L, true)))
  }

  test("summary reports the release-decision numbers including the " +
      "actual k level") {
    val s = Privacy.kAnonymitySummary(rows, Seq("lang", "src"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s == ((3L, 6L, 2L, 3L, 1L)))
  }

  test("a fully k-anonymous table audits clean") {
    val clean = Seq.fill(4)(("en", "a")).toDF("lang", "src")
    val s = Privacy.kAnonymitySummary(clean, Seq("lang", "src"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s == ((1L, 4L, 0L, 0L, 4L)))
  }

  test("lDiversityAudit flags homogeneous classes a k-audit passes") {
    // class A: 4 rows, ONE diagnosis -> k=3-safe but l=2-unsafe
    // class B: 3 rows, diagnoses x,x,y -> l-diverse, modal share 2/3
    val rows = Seq(
      ("A", "flu"), ("A", "flu"), ("A", "flu"), ("A", "flu"),
      ("B", "x"), ("B", "x"), ("B", "y")).toDF("zip", "diag")
    val out = Privacy.lDiversityAudit(rows, Seq("zip"), "diag", l = 2)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 4L, 1L, 1.0, true)))
    assert(out("B") == (("B", 3L, 2L, 0.6667, false)))
  }

  test("tClosenessAudit measures TVD vs the corpus distribution, " +
      "counting absent-value mass") {
    // global: flu 6/8, hiv 2/8. class A (4 rows, all flu):
    // TVD = 0.5*(|1-0.75| + |0-0.25|) = 0.25  — absent hiv contributes
    // class B (4 rows, flu 2 hiv 2): 0.5*(|0.5-0.75|+|0.5-0.25|) = 0.25
    val rows = Seq(
      ("A", "flu"), ("A", "flu"), ("A", "flu"), ("A", "flu"),
      ("B", "flu"), ("B", "flu"), ("B", "hiv"), ("B", "hiv"))
      .toDF("zip", "diag")
    val out = Privacy.tClosenessAudit(rows, Seq("zip"), "diag", t = 0.2)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 4L, 0.25, true)))
    assert(out("B") == (("B", 4L, 0.25, true)))
  }

  test("tClosenessAudit: a class matching the corpus scores zero and " +
      "the flag compares the ROUNDED tvd") {
    val rows = Seq(
      ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y")).toDF("zip", "diag")
    val out = Privacy.tClosenessAudit(rows, Seq("zip"), "diag", t = 0.1)
      .as[(String, Long, Double, Boolean)].collect()
    assert(out.forall(r => r._3 == 0.0 && !r._4))
  }
}
