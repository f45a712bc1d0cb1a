package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed shape of V1's nearest-revision resolution: the reference
  * resolves schema entries record-at-a-time on the driver
  * (s3_to_json_s3.py:231-254); over a DataFrame of records the same
  * semantics — "the entry with the greatest revision ≤ the record's
  * revision within the key group" — becomes a broadcast as-of join.
  *
  * Scale design: the entry side (an archive map) is tiny, so it is
  * pre-aggregated into one sorted candidate array per key and broadcast.
  * The nearest match is then picked per record with higher-order array
  * functions — the fact side is never shuffled and no window is needed.
  */
object SchemaResolver {

  /** For each record row, attach the single entry with the greatest
    * `entryRevCol` ≤ `recordRev` among entries sharing the join key.
    * Records with no qualifying entry are dropped (they fall through to
    * the next resolution scope, s3_to_json_s3.py:243-248).
    *
    * @param records    fact-side DataFrame
    * @param entries    small reference-side DataFrame (broadcast)
    * @param keys       equi-join key pairs (record column name, entry column name)
    * @param recordRev  record revision column
    * @param entryRevCol entry revision column name in `entries`
    * @param payloadCols entry columns to carry onto the record, emitted as
    *                    `resolved_{name}` plus `resolved_rev`
    */
  def resolveNearest(
      records: DataFrame,
      entries: DataFrame,
      keys: Seq[(String, String)],
      recordRev: Column,
      entryRevCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val candStruct = struct(
      (col(entryRevCol) +: payloadCols.map(col)): _*)
    val agg = entries
      .groupBy(keys.map { case (_, e) => col(e) }: _*)
      .agg(sort_array(collect_list(candStruct)).as("__cands"))
    val cond = keys.map { case (r, e) => records(r) === agg(e) }.reduce(_ && _)
    // try_element_at: ANSI-safe null (not an error) when no candidate
    // revision qualifies and the filtered array is empty
    val best = try_element_at(
      filter(col("__cands"), c => c.getField(entryRevCol) <= recordRev), lit(-1))
    records
      .join(broadcast(agg), cond)
      .withColumn("__best", best)
      .where(col("__best").isNotNull)
      .withColumn("resolved_rev", col("__best").getField(entryRevCol))
      .select(
        records.columns.map(records(_)) ++
          (col("resolved_rev") +: payloadCols.map(p =>
            col("__best").getField(p).as(s"resolved_$p"))): _*)
  }
}
