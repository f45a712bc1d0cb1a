// Local calibration aid for the Bench host-factor probe (not shipped):
// times the same synthetic workload Bench.hostControl runs, to pick the
// size and pin the reference constant.
import org.apache.spark.sql.functions._
val spark2 = spark
import spark2.implicits._
def once(): Double = {
  val t0 = System.nanoTime()
  spark.range(0L, 100000000L, 1L, 32)
    .select((col("id") % 1000000L).as("k"), xxhash64(col("id")).as("h"))
    .groupBy("k").agg(bit_xor(col("h")).as("x"))
    .agg(bit_xor(col("x"))).collect()
  (System.nanoTime() - t0) / 1e9
}
println(f"c1=${once()}%.3f c2=${once()}%.3f c3=${once()}%.3f")
