// Probe: inverted-index vs bitset exact Jaccard at sf0.1 (warm second runs).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 -i tools/probe_jaccard.sc
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
def mat(df: org.apache.spark.sql.DataFrame): Long = {
  val h = xxhash64(df.columns.toIndexedSeq.map(col): _*)
  df.select(h.as("h")).agg(bit_xor(col("h"))).collect()
  df.count()
}
def time[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
}
for (pass <- 1 to 2) {
  val a = time(s"inverted p$pass")(mat(Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)))
  val b = time(s"bitset   p$pass")(mat(Dedup.jaccardPairsBitset(docs, "doc_id", "text", 0.8)))
  println(s"[probe] rows inverted=$a bitset=$b")
}
sys.exit(0)
