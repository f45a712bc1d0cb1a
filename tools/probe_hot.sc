// Probe the bench's slowest queries at sf0.1 (warm, 2 runs each).
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
def mat(df: org.apache.spark.sql.DataFrame): Unit = {
  val h = xxhash64(df.columns.toIndexedSeq.map(col): _*)
  df.select(h.as("h")).agg(bit_xor(col("h"))).collect(); ()
}
val names = Seq("dedup_jaccard", "dedup_clusters", "a10_sketches",
  "dedup_minhash", "bm_incremental", "ann_ivf_topk")
for (n <- names; r <- 1 to 2) {
  val t0 = System.nanoTime()
  mat(graft.SparkEntry.queries(n)(spark, dir))
  println(f"[probe] $n run$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
}
sys.exit(0)
