package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaSpec extends AnyFunSuite {

  test("catalog loads all 10 production tables " +
      "(dataset_crawler_assignments.yaml:1-12)") {
    val names = TableCatalog.default.keySet
    assert(names == Set(
      "3DRotation_v1", "ArchiveMetadata_v1", "AudioLevelRecord_v1",
      "LetterNumberSeries_v1", "MotionRecord_v1", "ProgressiveMatrices_v1",
      "sharedSchema_v1", "sharedSchema_for_Gradual_Onset_v1",
      "VerbalReasoning_v1", "WeatherResult_v1"))
  }

  test("hive DDL parses: primitives, struct, array, nesting") {
    assert(TableCatalog.parseType("string") == StringType)
    assert(TableCatalog.parseType("int") == IntegerType)
    assert(TableCatalog.parseType("double") == DoubleType)
    assert(TableCatalog.parseType("boolean") == BooleanType)
    assert(TableCatalog.parseType("array<string>") == ArrayType(StringType))
    val st = TableCatalog.parseType("struct<a:int,b:array<struct<c:double>>>")
    assert(st == StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", ArrayType(StructType(Seq(StructField("c", DoubleType))))))))
  }

  test("every declared column type in the catalog parses") {
    TableCatalog.default.values.foreach { t =>
      (t.columns ++ t.partitionKeys).foreach { c =>
        val dt = c.dataType
        assert(dt != null, s"${t.name}.${c.name}")
      }
    }
    // deep production type: sharedSchema stephistory is array<struct<...>>
    val steph = TableCatalog.default("sharedSchema_v1")
      .columns.find(_.name == "stephistory").get.dataType
    assert(steph.isInstanceOf[ArrayType])
    assert(steph.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType])
  }

  test("partition keys are string-typed and appended in fullSchema") {
    val t = TableCatalog.default("WeatherResult_v1")
    assert(t.partitionKeys.map(_.name) == Seq("assessmentid", "year", "month", "day"))
    assert(t.partitionKeys.forall(_.dataType == StringType))
    assert(t.fullSchema.fieldNames.endsWith(
      Array("assessmentid", "year", "month", "day")))
  }

  test("schema merge: additive fields append (compatible evolution)") {
    val a = StructType.fromDDL("x int, y string")
    val b = StructType.fromDDL("x int, z double")
    val Right(m) = SchemaMerge.merge(a, b): @unchecked
    assert(m.fieldNames.toSeq == Seq("x", "y", "z"))
  }

  test("schema merge: numeric widening int -> long -> double") {
    val a = StructType.fromDDL("x int")
    val b = StructType.fromDDL("x double")
    val Right(m) = SchemaMerge.merge(a, b): @unchecked
    assert(m("x").dataType == DoubleType)
  }

  test("schema merge: recursive struct/array merge") {
    val a = StructType.fromDDL("s struct<a:int>, xs array<struct<k:int>>")
    val b = StructType.fromDDL("s struct<b:string>, xs array<struct<k:long>>")
    val Right(m) = SchemaMerge.merge(a, b): @unchecked
    assert(m("s").dataType == StructType.fromDDL("a int, b string"))
    assert(m("xs").dataType ==
      ArrayType(StructType(Seq(StructField("k", LongType)))))
  }

  test("schema merge: incompatible type change reported with path") {
    val a = StructType.fromDDL("s struct<a:int>, t string")
    val b = StructType.fromDDL("s struct<a:string>, t struct<x:int>")
    val Left(errs) = SchemaMerge.merge(a, b): @unchecked
    assert(errs.map(_.path).toSet == Set("s.a", "t"))
  }
}
