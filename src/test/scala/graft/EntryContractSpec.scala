package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Entry-output contract: the driver's correctness checker loads each
  * entry's parquet into pandas and lexsorts ALL columns before hashing —
  * a top-level Array/Map/Struct column raises
  * `TypeError: unhashable type: 'numpy.ndarray'` there, turning a
  * value-correct entry red (r10 lost `ann_int8_quantize` and
  * `ann_mean_pool` to exactly this; r9 lost `chat_template_render` to
  * the sibling uncast-HUGEINT foot-gun). Complex payloads must leave the
  * registry as `to_json` strings (ints/strings; double rendering is NOT
  * engine-stable) or in long format (id, pos, value).
  *
  * The walk constructs every registry entry at sf0.001 and checks its
  * ANALYZED schema — lazy entries cost milliseconds; the handful of
  * eager ones (sink round-trips, streaming drains) do their small-sf
  * work once here, which doubles as a construction smoke test.
  */
class EntryContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def complexCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => f.name
    }.toSeq

  test("the checker helper itself flags an array-typed probe") {
    import spark.implicits._
    val probe = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    assert(complexCols(probe.schema) == Seq("vec"))
    assert(complexCols(probe.select(col("id"),
      to_json(col("vec")).as("vec")).schema).isEmpty)
  }

  test("no registry entry emits a top-level Array/Map/Struct column") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val offending = complexCols(q(spark, sfDir).schema)
        if (offending.isEmpty) Nil
        else Seq(s"$name: ${offending.mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"driver-unsortable output columns:\n  ${bad.mkString("\n  ")}")
  }
}
