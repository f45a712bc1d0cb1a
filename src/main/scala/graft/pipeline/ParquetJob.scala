package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

import graft.relationalize.Relationalize
import graft.schema.TableSpec
import graft.sources.{JsonDataset, ParquetDataset}
import graft.streaming.Bookmark

/** Stage-2 job (E2, json_s3_to_parquet.py:179-233), Spark-native: one run
  * converts a JSON dataset's new files into partitioned Parquet datasets —
  * the root table plus one child per nested path.
  *
  * Differences from the reference, by design:
  *  - relationalize carries the partition columns into children directly
  *    (R2) instead of a distinct+join per child
  *  - incremental state is an explicit file manifest (Bookmark) instead of
  *    an opaque Glue job bookmark; reset = delete the manifest
  *  - the per-dataset fan-out is a plain loop/Par collection over dataset
  *    names in one SparkSession instead of one Glue job per table
  */
object ParquetJob {

  final case class Result(tables: Map[String, Long])

  /** The injected columns every table carries (schemas/BridgeDownstream
    * .json:37-44): recordid plus the partition fields.
    */
  val CarryCols: Seq[String] =
    Seq("recordid", "assessmentid", "year", "month", "day")

  /** Run one dataset: read new NDJSON files (bookmark-filtered) with the
    * declared schema, relationalize if nested, append every produced
    * table to its partitioned Parquet dataset, then advance the bookmark.
    * Returns per-table appended row counts.
    *
    * @param outName output table name + bookmark identity when it differs
    *                from the source dataset — the schema-versioning case
    *                ([[SchemaEvolution]]): a `docs_v2` table draining the
    *                `docs_v1` JSON layout under its own manifest
    * @param newFiles pre-computed new-file list (Bookmark.newFiles) to
    *                pin the exact batch, e.g. the files schema inference
    *                just examined; None re-derives from the manifest
    */
  def run(
      spark: SparkSession,
      jsonRoot: String,
      dataset: String,
      spec: TableSpec,
      parquetRoot: String,
      manifestRoot: String,
      outName: Option[String] = None,
      newFiles: Option[Seq[String]] = None): Result = {
    val table = outName.getOrElse(dataset)
    val dataPath = s"$jsonRoot/dataset=$dataset"
    val manifestPath = s"$manifestRoot/$table"
    val raw = JsonDataset.read(spark, jsonRoot, dataset, spec.schema)
    val fresh = Bookmark.newDataFrom(spark, raw, dataPath, manifestPath, newFiles)
    if (fresh.isEmpty) return Result(Map.empty)

    val tables: Map[String, DataFrame] =
      if (Relationalize.hasNestedFields(fresh.schema))
        Relationalize.relationalize(
          fresh, table, keyCols = Seq("recordid"), carryCols = CarryCols)
      else Map(table -> fresh)

    val counts = tables.map { case (name, df) =>
      // partition columns must be last for partitionBy; ensure presence
      val out = df.select(
        (df.columns.filterNot(JsonDataset.PartitionCols.contains) ++
          JsonDataset.PartitionCols).map(col).toIndexedSeq: _*)
      // The reported row count rides the write action as an observed
      // metric (a CollectMetrics node under the writer), so each table's
      // plan executes exactly once; a separate count() would recompute
      // the whole table from the NDJSON source just to report a number.
      val obs = Observation()
      ParquetDataset.write(
        out.observe(obs, count(lit(1)).as("rows")), s"$parquetRoot/$name")
      // a table with zero rows schedules zero tasks, so CollectMetricsExec
      // never updates its accumulator and the observation resolves to an
      // empty map — that absence IS the zero count
      name -> obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
    }
    newFiles match {
      case Some(ps) => Bookmark.commitFiles(spark, manifestPath, ps)
      case None => Bookmark.commit(spark, dataPath, manifestPath)
    }
    Result(counts)
  }
}
