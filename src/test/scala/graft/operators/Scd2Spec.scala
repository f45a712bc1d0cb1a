package graft.operators

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update with per-column " +
      "attribution; unchanged rows drop") {
    val oldS = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "t", "v")
    val newS = Seq(
      (1L, "a", 10.0),            // unchanged
      (2L, "B", 20.0),            // t changed
      (3L, "C", 31.0),            // both changed
      (5L, "e", 50.0)).toDF("k", "t", "v") // insert; 4 deleted
    val out = Scd2.snapshotDiff(oldS, newS, Seq("k"), Seq("t", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      2L -> ("update", "t"),
      3L -> ("update", "t,v"),
      4L -> ("delete", ""),
      5L -> ("insert", "")))
  }

  test("snapshotDiff treats NULL transitions as updates (null-safe)") {
    val oldS = Seq((1L, Option("x")), (2L, None: Option[String]))
      .toDF("k", "t")
    val newS = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("k", "t")
    val out = Scd2.snapshotDiff(oldS, newS, Seq("k"), Seq("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // NULL = NULL is a match (row 2 unchanged, drops); x -> NULL updates
    assert(out.toSeq == Seq((1L, "update", "t")))
  }

  test("buildHistory compresses version runs into [from, to) with " +
      "is_current, per key, gaps allowed") {
    val rows = Seq(
      // key A: a a b b a  (versions 1,2,4,5,9 — gap at 3 and 6-8)
      ("A", 1L, "a"), ("A", 2L, "a"), ("A", 4L, "b"), ("A", 5L, "b"),
      ("A", 9L, "a"),
      // key B: single version
      ("B", 7L, "z")).toDF("k", "ver", "attr")
    val out = Scd2.buildHistory(rows, Seq("k"), "ver", Seq("attr"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))
    assert(out.toSeq == Seq(
      ("A", "a", 1L, Some(4L), false),
      ("A", "b", 4L, Some(9L), false),
      ("A", "a", 9L, None, true),
      ("B", "z", 7L, None, true)))
  }

  test("applyDiff(old, snapshotDiff(old, new)) == new — the patch " +
      "round-trip, swept over residue-derived snapshot pairs") {
    // property-style sweep: several (old, new) pairs carved from one
    // base set by different membership/mutation residues
    val base = (0L until 120L).map(i => (i, s"t${i % 7}", (i * 3 % 41).toDouble))
    for (m <- Seq(2, 3, 5)) {
      val oldS = base.filter(_._1 % m != 0).toDF("k", "t", "v")
      val newS = base.filter(_._1 % (m + 2) != 0)
        .map { case (k, t, v) =>
          (k, if (k % 4 == 0) t + "x" else t, if (k % 6 == 0) v + 1 else v)
        }.toDF("k", "t", "v")
      val diff = Scd2.snapshotDiff(oldS, newS, Seq("k"), Seq("t", "v"))
      val rebuilt = Scd2.applyDiff(oldS, diff, Seq("k"), Seq("t", "v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      val want = newS.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rebuilt == want, s"round-trip failed for m=$m")
      // and the empty-diff identity
      val noop = Scd2.applyDiff(oldS,
        Scd2.snapshotDiff(oldS, oldS, Seq("k"), Seq("t", "v")),
        Seq("k"), Seq("t", "v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      val old = oldS.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(noop == old, "diff(a, a) must be the identity patch")
    }
  }

  test("buildHistory null-safe attr comparison: null runs compress too") {
    val rows = Seq(("K", 1L, null: String), ("K", 2L, null: String),
      ("K", 3L, "x")).toDF("k", "ver", "attr")
    val out = Scd2.buildHistory(rows, Seq("k"), "ver", Seq("attr"))
      .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
      .sortBy(_._2)
    assert(out.toSeq == Seq((None, 1L), (Some("x"), 3L)))
  }
}
