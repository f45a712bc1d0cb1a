package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the index-write frame's formatted plan WITH and
  * WITHOUT the byte-sized rebalance ([[graft.ann.Ann.sizedByCluster]])
  * — `runMain graft.ProbePlan <sfDir>`. The lifecycle entries' returned
  * frames are k-sized localCheckpoints (their explain is one
  * LogicalRDD scan), so the write-side plan is where the r20 change
  * shows; this prints both shapes for the plans/r20 artifacts.
  */
object ProbePlan {
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
    import graft.ann.Ann
    val emb = Tables.load(spark, dir, "embeddings")
    val even = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val odd = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val cb = Ann.pqSeedCodebook(even, "vec_id", "embedding", 8, 16)
    val cents = Ann.pivotCentroids(even, "label", "vec_id", "embedding")
    val enc = Ann.encodeAssign(odd, "vec_id", "embedding", cb, cents, "label")
    println("==== index write frame WITHOUT rebalance (pre-r20) ====")
    enc.explain("formatted")
    println("==== index write frame WITH sizedByCluster (r20) ====")
    Ann.sizedByCluster(enc, "label").explain("formatted")
    spark.stop()
  }
}
