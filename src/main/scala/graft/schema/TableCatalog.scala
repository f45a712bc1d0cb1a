package graft.schema

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** A declared table: columns + Hive-style partition keys, both as Hive DDL
  * type strings (the reference's table_columns.yaml model — columns at
  * :2-46, partition keys at :39-47; table creation
  * templates/study-pipeline-infra.j2:150-177).
  */
final case class ColumnSpec(name: String, hiveType: String) {
  def dataType: DataType = TableCatalog.parseType(hiveType)
  def field: StructField = StructField(name, dataType)
}

final case class TableSpec(
    name: String,
    columns: Seq[ColumnSpec],
    partitionKeys: Seq[ColumnSpec]) {

  /** Data columns only — the schema applied to the JSON scan (S2). */
  def schema: StructType = StructType(columns.map(_.field))

  /** Data + partition columns, as read back from a partitioned dataset.
    * Partition values are `string` as keys even when `int` in data
    * (table_columns.yaml:96-105 vs :39-47) — the key type wins here.
    */
  def fullSchema: StructType =
    StructType(columns.map(_.field) ++ partitionKeys.map(_.field))
}

/** Registry of declared table schemas — the Glue-catalog equivalent.
  *
  * Hive DDL type strings (`struct<...>`, `array<...>`, primitives) parse
  * through Spark's own CatalystSqlParser, so the catalog accepts exactly
  * the type language the reference's Glue tables declare. Reading a JSON
  * dataset with the declared schema replaces both the catalog lookup and
  * `resolveChoice(match_catalog)` (json_s3_to_parquet.py:59-79): ambiguous
  * values simply parse into the declared type or null.
  */
object TableCatalog {

  def parseType(hiveType: String): DataType =
    CatalystSqlParser.parseDataType(hiveType)

  /** The ten production tables bundled as a resource
    * (from the reference's table_columns.yaml, see
    * dataset_crawler_assignments.yaml:1-12).
    */
  lazy val default: Map[String, TableSpec] = {
    val in = getClass.getResourceAsStream("/graft/tables.json")
    require(in != null, "missing /graft/tables.json resource")
    val root = new ObjectMapper().readTree(in)
    in.close()
    val tables = root.get("tables")
    tables.properties().asScala.map { e =>
      val name = e.getKey
      def specs(field: String): Seq[ColumnSpec] =
        e.getValue.get(field).elements().asScala.map { pair =>
          ColumnSpec(pair.get(0).asText(), pair.get(1).asText())
        }.toSeq
      name -> TableSpec(name, specs("columns"), specs("partition_keys"))
    }.toMap
  }
}
