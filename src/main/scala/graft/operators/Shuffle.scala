package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + sharding — the write-side order a
  * training run consumes: examples must be (a) de-correlated from
  * ingest order (a crawl lands sorted by host; training on that order
  * skews every early batch toward one site) and (b) split into a fixed
  * number of shards whose membership and internal order never change
  * across retries. Seeded md5 rank gives both without RNG state — the
  * repo's no-RNG determinism convention (so6/so7/so10).
  *
  * Scale shape: shard assignment is a pure projection (no shuffle);
  * the within-shard position is a rank window PARTITIONED by shard —
  * 16^nibbles balanced md5 buckets, so the sort is per-shard and the
  * widest task holds |corpus| / 16^nibbles rows. nibbles is the scale
  * valve: 100 TB wants nibbles ≥ 3 (4096 shards), and because the
  * shard key is a hash prefix the same rows land in the same shard at
  * any nibble depth's refinement.
  */
object Shuffle {

  /** (id, shard, pos): shard = first `nibbles` hex chars of
    * md5(id:seed), pos = 1-based rank of the full hash within the
    * shard (ties — md5 collisions — broken by id).
    */
  def deterministicShard(df: DataFrame, idCol: String, seed: String,
      nibbles: Int = 1): DataFrame = {
    require(nibbles >= 1 && nibbles <= 8,
      s"nibbles must be in [1, 8], got $nibbles")
    val h = md5(concat(col(idCol).cast("string"), lit(":"), lit(seed)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", substring(col("__h"), 1, nibbles))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
