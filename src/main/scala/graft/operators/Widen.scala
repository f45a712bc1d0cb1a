package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Deduplicate, Join, RepartitionOperation, Sort, Window => LWindow}

/** Partition-width guard for compute-bound stages (shingling, signature
  * hashing, pair scoring, blob decoding): work per byte is high, so the
  * stage needs at least one partition per core even when the input is a
  * single small file. A file-source scan produces roughly
  * `bytes / spark.sql.files.maxPartitionBytes` partitions, so a small
  * input otherwise pins the whole computation to one task.
  *
  * The probe uses logical-plan statistics (file sizes), NOT
  * `df.rdd.getNumPartitions` — the latter forces a full physical
  * planning + RDD DAG construction per call just to read one number.
  * On a real cluster the input is already wide (estimated bytes exceed
  * one scan-partition per core) and this is a no-op, so no shuffle is
  * added at scale.
  */
object Widen {

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    // an upstream exchange already spread the data across
    // spark.sql.shuffle.partitions tasks — a second round-robin shuffle
    // would cost a full pass for nothing
    val alreadyShuffled = plan.exists {
      case _: RepartitionOperation | _: Join | _: Aggregate |
           _: Deduplicate | _: Sort | _: LWindow => true
      case _ => false
    }
    val maxPartBytes = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val estBytes = plan.stats.sizeInBytes
    if (!alreadyShuffled && estBytes < BigInt(maxPartBytes) * target)
      df.repartition(target)
    else df
  }
}
