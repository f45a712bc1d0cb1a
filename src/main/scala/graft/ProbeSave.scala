package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-probe: decompose the index build_save + drain-stage write
  * cost — `runMain graft.ProbeSave <sfDir>`. Times, warm (3 reps each):
  * codebook seed collect, pqEncode plan+write with/without partitionBy,
  * writeCodebook, encodeAssign write, and the same write with committer
  * v2 and without compression, so the parquet/commit overheads separate
  * from the plan cost.
  */
object ProbeSave {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    import graft.ann.Ann
    val emb = Tables.load(spark, dir, "embeddings")
    val even = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val odd = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val scratch = java.nio.file.Files.createTempDirectory("graft_probe_sv")
    val base = scratch.toString
    for (r <- 1 to 3) {
      val cb = t(s"r$r pqSeedCodebook") {
        Ann.pqSeedCodebook(even, "vec_id", "embedding", m = 8, ksub = 16)
      }
      val cents = t(s"r$r pivotCentroids") {
        Ann.pivotCentroids(even, "label", "vec_id", "embedding")
      }
      val indexed = t(s"r$r pqEncode+join plan") {
        Ann.pqEncode(even, "vec_id", "embedding", cb)
          .join(even.select(col("vec_id"), col("label")), "vec_id")
      }
      t(s"r$r codes write partitionBy") {
        indexed.write.mode("overwrite").partitionBy("label")
          .parquet(s"$base/codes_p$r")
      }
      t(s"r$r codes write flat") {
        indexed.write.mode("overwrite").parquet(s"$base/codes_f$r")
      }
      t(s"r$r codes write flat uncompressed") {
        indexed.write.mode("overwrite")
          .option("compression", "none").parquet(s"$base/codes_u$r")
      }
      t(s"r$r writeCodebook") {
        Ann.writeCodebook(spark, cb, s"$base/cb$r")
      }
      val enc = t(s"r$r encodeAssign plan+analyze") {
        val df = Ann.encodeAssign(odd, "vec_id", "embedding", cb,
          cents, "label")
        df.queryExecution.executedPlan // force analysis+planning
        df
      }
      t(s"r$r encodeAssign write partitionBy") {
        enc.write.mode("overwrite").partitionBy("label")
          .parquet(s"$base/stage_p$r")
      }
      t(s"r$r encodeAssign collect only") { enc.collect() }
      t(s"r$r noop job") {
        spark.range(0, 1000, 1, 1).select(sum(col("id"))).collect()
      }
    }
    // rebalance-by-cluster comparison
    val cb = Ann.pqSeedCodebook(even, "vec_id", "embedding", 8, 16)
    val indexed = Ann.pqEncode(even, "vec_id", "embedding", cb)
      .join(even.select(col("vec_id"), col("label")), "vec_id")
    for (r <- 1 to 3)
      t(s"rebal r$r codes write partitionBy") {
        indexed.hint("rebalance", col("label"))
          .write.mode("overwrite").partitionBy("label")
          .parquet(s"$base/codes_rb_$r")
      }
    for (r <- 1 to 3)
      t(s"rebal-flat r$r write") {
        indexed.hint("rebalance")
          .write.mode("overwrite").parquet(s"$base/flat_rb_$r")
      }
    def census(p: String): String = {
      val d = new java.io.File(p)
      d.listFiles().map(f =>
        if (f.isDirectory) f.getName + "=" + f.listFiles().length
        else f.getName).mkString(", ")
    }
    println("[probe] files in codes_p1: " + census(s"$base/codes_p1"))
    println("[probe] files in codes_rb_1: " + census(s"$base/codes_rb_1"))
    println("[probe] files in flat_rb_1: " + census(s"$base/flat_rb_1"))
    EntryKit.deleteRecursively(scratch)
    spark.stop()
  }
}
