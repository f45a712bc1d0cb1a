// a10_sketches: single mixed aggregate vs split-and-broadcast-join.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
def mat(df: org.apache.spark.sql.DataFrame): Unit = {
  val h = xxhash64(df.columns.toIndexedSeq.map(col): _*)
  df.select(h.as("h")).agg(bit_xor(col("h"))).collect(); ()
}
val ev = graft.Tables.load(spark, dir, "events")
def time(tag: String)(f: => Unit): Unit = {
  for (r <- 1 to 2) {
    val t0 = System.nanoTime()
    f
    println(f"[a10] $tag run$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }
}
def split = {
  val exact = ev.groupBy(col("event_type")).agg(
    countDistinct(col("user_id")).as("n_exact"),
    round(min(col("value")), 4).as("vmin"),
    round(max(col("value")), 4).as("vmax"))
  val approx = ev.groupBy(col("event_type")).agg(
    approx_count_distinct(col("user_id")).as("n_approx"),
    expr("approx_percentile(value, 0.5)").as("p50_approx"))
  exact.join(broadcast(approx), "event_type")
    .select(col("event_type"), col("n_exact"),
      (abs(col("n_approx") - col("n_exact")) <=
        greatest(col("n_exact") * 0.15, lit(3.0))).as("hll_ok"),
      col("p50_approx").between(col("vmin"), col("vmax")).as("tdigest_ok"),
      col("vmin"), col("vmax"))
}
time("split_join") { mat(split) }
time("full_entry") { mat(graft.SparkEntry.queries("a10_sketches")(spark, dir)) }
println("=== mixed plan ===")
graft.SparkEntry.queries("a10_sketches")(spark, dir).explain("formatted")
sys.exit(0)
