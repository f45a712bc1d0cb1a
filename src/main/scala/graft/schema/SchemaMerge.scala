package graft.schema

import org.apache.spark.sql.types._

/** Crawler-equivalent schema evolution: merge an existing declared schema
  * with one inferred from new partitions, under the reference's
  * `CombineCompatibleSchemas` policy (study-pipeline-infra.j2:178-218) and
  * the compatible/incompatible protocol (docs/schema_change_protocol.md):
  *
  *  - new fields are appended (compatible — additive evolution)
  *  - identical types merge to themselves; numeric types widen along
  *    int → long → double; structs/arrays merge recursively
  *  - anything else (e.g. string vs struct) is an incompatible change and
  *    is reported with its field path so the caller can version the
  *    dataset instead of silently corrupting it
  */
object SchemaMerge {

  final case class Incompatible(path: String, left: DataType, right: DataType) {
    override def toString = s"$path: ${left.simpleString} vs ${right.simpleString}"
  }

  def merge(existing: StructType, incoming: StructType): Either[Seq[Incompatible], StructType] =
    mergeStruct(existing, incoming, prefix = "")

  private def mergeStruct(
      a: StructType, b: StructType, prefix: String): Either[Seq[Incompatible], StructType] = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fieldNames.toSet
    val errs = Seq.newBuilder[Incompatible]
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case None => fa
        case Some(fb) =>
          mergeType(fa.dataType, fb.dataType, s"$prefix${fa.name}") match {
            case Right(t) => fa.copy(dataType = t)
            case Left(es) => errs ++= es; fa
          }
      }
    } ++ b.fields.filterNot(f => aNames.contains(f.name))
    val es = errs.result()
    if (es.nonEmpty) Left(es) else Right(StructType(merged))
  }

  private def mergeType(
      a: DataType, b: DataType, path: String): Either[Seq[Incompatible], DataType] =
    (a, b) match {
      case (x, y) if x == y => Right(x)
      case (sa: StructType, sb: StructType) => mergeStruct(sa, sb, s"$path.")
      case (ArrayType(ea, na), ArrayType(eb, nb)) =>
        mergeType(ea, eb, s"$path[]").map(ArrayType(_, na || nb))
      case (x: NumericType, y: NumericType) => widen(x, y) match {
        case Some(t) => Right(t)
        case None => Left(Seq(Incompatible(path, a, b)))
      }
      case _ => Left(Seq(Incompatible(path, a, b)))
    }

  private val widening: Seq[DataType] =
    Seq(IntegerType, LongType, DoubleType)

  private def widen(a: NumericType, b: NumericType): Option[DataType] = {
    val (ia, ib) = (widening.indexOf(a), widening.indexOf(b))
    if (ia < 0 || ib < 0) None else Some(widening(math.max(ia, ib)))
  }
}
