// Post-close r16 probe: where does a lifecycle-replay entry's time go?
// Decomposes the streamed-upsert drain into (a) pure micro-batch
// machinery (foreachBatch that only counts), (b) the real drain
// (encode+assign+stage per batch), (c) the per-batch work as a plain
// batch job, (d) serve cost and its FS-listing overhead. Read-only:
// writes only to /tmp scratch.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
}
val emb = spark.read.parquet(s"$dir/embeddings.parquet")
val even = emb.where(pmod(col("vec_id"), lit(2)) === 0)
val odd = emb.where(pmod(col("vec_id"), lit(2)) === 1)
val cb = graft.ann.Ann.pqSeedCodebook(even, "vec_id", "embedding", 8, 16)
val cents = graft.ann.Ann.pivotCentroids(even, "label", "vec_id", "embedding")
val scratch = java.nio.file.Files.createTempDirectory("graft_probe").toString
odd.repartition(2).write.parquet(s"$scratch/in")
for (r <- 1 to 2) {
  // (a) minimal drain: same source shape, trivial sink
  t(s"minimal_drain_2batches run$r") {
    spark.readStream.schema(odd.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$scratch/in")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$scratch/ckpt_min$r")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        { b.count(); () })
      .start().awaitTermination()
  }
  // (b) the real drain on a fresh index
  val idx = s"$scratch/idx$r"
  t(s"build_save run$r") {
    graft.ann.Ann.saveIndex(
      graft.ann.Ann.pqEncode(even, "vec_id", "embedding", cb)
        .join(even.select(col("vec_id"), col("label")), "vec_id"),
      "label", cb, idx)
  }
  t(s"real_drain_2batches run$r") {
    graft.streaming.StreamingIngest.annIndexUpsertDrain(
      spark.readStream.schema(odd.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/in"),
      idx, s"$scratch/ckpt_real$r", "vec_id", "embedding", cents, "label")
      .awaitTermination()
  }
  // (c) the same work as ONE batch job (encode+assign+write)
  t(s"batch_equivalent run$r") {
    graft.ann.Ann.encodeAssign(odd, "vec_id", "embedding", cb, cents, "label")
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$scratch/batch_eq$r")
  }
  // (d) serve: forced materialization, then repeat to isolate listings
  def serve(): Unit = {
    val df = graft.streaming.StreamingIngest.loadStreamedCodes(
      spark, idx, "vec_id", "label")
    df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
      .agg(bit_xor(col("h"))).collect(); ()
  }
  t(s"serve_cold run$r") { serve() }
  t(s"serve_warm run$r") { serve() }
}
sys.exit(0)
