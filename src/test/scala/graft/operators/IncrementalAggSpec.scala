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
    val path = Files.createTempDirectory("inc_agg").toString + "/t"
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
    val path = Files.createTempDirectory("inc_agg2").toString + "/t"
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
}
