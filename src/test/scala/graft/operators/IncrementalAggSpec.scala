package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def facts = (1L to 300L)
    .map(i => (i, s"g${(i % 5)}", i % 7, (i % 13).toDouble))
    .toDF("id", "grp", "n", "v")

  private def delta(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("grp").agg(
      sum($"n").as("total_n"), sum($"v").as("total_v"))

  test("two merged deltas equal the full recompute exactly") {
    val path = graft.EntryKit.scratchTracked("inc_agg").toString + "/t"
    val (a, b) = (facts.filter($"id" % 2 === 0), facts.filter($"id" % 2 === 1))
    IncrementalAgg.mergeAdditive(spark, path, delta(a),
      Seq("grp"), Seq("total_n", "total_v"), Seq("grp"))
    IncrementalAgg.mergeAdditive(spark, path, delta(b),
      Seq("grp"), Seq("total_n", "total_v"), Seq("grp"))
    val got = spark.read.parquet(path)
      .select("grp", "total_n", "total_v")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val full = delta(facts)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == full)
  }

  test("a delta touching one key leaves other partitions' files " +
      "byte-identical and only adjusts that key") {
    val path = graft.EntryKit.scratchTracked("inc_agg2").toString + "/t"
    IncrementalAgg.mergeAdditive(spark, path, delta(facts),
      Seq("grp"), Seq("total_n", "total_v"), Seq("grp"))
    def files(): Map[String, Long] = {
      val root = new java.io.File(path)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    val one = Seq(("g1", 100L, 2.5)).toDF("grp", "total_n", "total_v")
    IncrementalAgg.mergeAdditive(spark, path, one,
      Seq("grp"), Seq("total_n", "total_v"), Seq("grp"))
    val after = files()
    val untouchedBefore = before.filterNot(_._1.contains("grp=g1"))
    assert(untouchedBefore.toSet.subsetOf(after.toSet),
      "untouched partition files changed")
    val g1 = spark.read.parquet(path).filter($"grp" === "g1")
      .select("total_n", "total_v").as[(Long, Double)].head()
    val g1Full = delta(facts.filter($"grp" === "g1"))
      .select("total_n", "total_v").as[(Long, Double)].head()
    assert(g1 == ((g1Full._1 + 100L, g1Full._2 + 2.5)))
  }

  test("contract violations are rejected loudly") {
    val d = Seq(("g1", 1L)).toDF("grp", "total_n")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeAdditive(spark, "/tmp/x", d,
        Seq("grp"), Seq("total_n"), Seq("other"))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeAdditive(spark, "/tmp/x", d,
        Seq("grp"), Seq("total_n", "missing"), Seq("grp"))
    }
  }

  test("monoid state: any batch split folds to the full recompute, " +
      "min/max included") {
    val rows = (1L to 60L).map(i =>
      (i, s"k${i % 4}", (i * 7 % 23).toDouble))
    val df = rows.toDF("id", "k", "v")
    val full = IncrementalAgg.finalizeState(
      IncrementalAgg.partials(df, Seq("k"), "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    for (nSplits <- Seq(2, 3, 5)) {
      val batches = (0 until nSplits).map(m =>
        df.where($"id" % nSplits === m))
      val state = batches.tail.foldLeft(
        IncrementalAgg.partials(batches.head, Seq("k"), "v")) { (st, b) =>
        IncrementalAgg.merge(st, IncrementalAgg.partials(b, Seq("k"), "v"),
          Seq("k"))
      }
      val inc = IncrementalAgg.finalizeState(state)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      assert(inc == full, s"$nSplits-way split diverged")
    }
  }

  test("monoid state: a delta with a NEW key appears; untouched keys " +
      "carry forward; empty delta is the identity") {
    val st0 = IncrementalAgg.partials(
      Seq((1L, "a", 2.0), (2L, "a", 4.0)).toDF("id", "k", "v"),
      Seq("k"), "v")
    val st1 = IncrementalAgg.merge(st0,
      IncrementalAgg.partials(Seq((3L, "b", 9.0)).toDF("id", "k", "v"),
        Seq("k"), "v"), Seq("k"))
    val m = IncrementalAgg.finalizeState(st1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(m("a") == ((2L, 6.0, 2.0, 4.0, 3.0)))
    assert(m("b") == ((1L, 9.0, 9.0, 9.0, 9.0)))
    val st2 = IncrementalAgg.merge(st1, st1.where($"cnt" < 0), Seq("k"))
    assert(IncrementalAgg.finalizeState(st2).collect().map(_.toSeq).toSet ==
      IncrementalAgg.finalizeState(st1).collect().map(_.toSeq).toSet)
  }
}
