package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for the Hamming distance between two
  * packed sign-bit words (`array<long>`, [[graft.ann.Quantize]]'s
  * layout): Σ popcount(aᵢ XOR bᵢ).
  *
  * This is the binary-ANN scan's innermost loop — |corpus|·|queries|
  * evaluations per scan — and the `zip_with` + `bit_count` +
  * `aggregate` higher-order form allocates a result array and runs
  * interpreted lambdas per word. This expression participates in
  * whole-stage codegen as a tight `Long.bitCount` loop: zero
  * allocation, one JIT-friendly reduction per pair, same numbers
  * (HammingDistanceSpec pins parity with the HOF form). A shorter
  * array reads as zero-extended — absent words contribute the other
  * side's popcount — matching [[graft.ann.Quantize.binaryHammingTopK]]
  * degenerate-input semantics.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, " +
          s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var s = 0
    var i = 0
    while (i < n) {
      val xa = if (i < nx) x.getLong(i) else 0L
      val ya = if (i < ny) y.getLong(i) else 0L
      s += java.lang.Long.bitCount(xa ^ ya)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long xw = $i < $nx ? $a.getLong($i) : 0L;
         |  long yw = $i < $ny ? $b.getLong($i) : 0L;
         |  $s += java.lang.Long.bitCount(xw ^ yw);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {

  /** SQL-visible name, registered via [[graft.GraftExtensions]]. */
  val Name = "graft_hamming"

  /** Column API for the native Hamming distance; requires a session
    * built with `spark.sql.extensions=graft.GraftExtensions`.
    */
  def hammingNative(a: Column, b: Column): Column = call_function(Name, a, b)
}
