package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Native membership test against a Bloom-filter bitset held in an
  * `array<long>` column (one 64-bit word per element).
  *
  * The k probe positions derive from two 64-bit hashes via
  * Kirsch-Mitzenmacher double hashing: `pos_i = fold(h1 + i*h2) mod m`,
  * where `fold` flips negative combined values (`~c`) so the modulus is
  * taken over a non-negative value. The arithmetic intentionally lives in
  * JVM code (here and in [[graft.operators.BloomJoin.position]]) rather
  * than in Spark SQL arithmetic: `h1 + i*h2` wraps around Long.MaxValue
  * by design, which ANSI-mode SQL arithmetic would reject as overflow.
  *
  * Codegen: a tight loop over `ArrayData.getLong` — no per-row array
  * copy, stays inside whole-stage codegen next to the xxhash64 calls
  * that produce h1/h2.
  *
  * Children: (bits: array<long>, h1: long, h2: long, k: int, m: long);
  * k and m are plan-time literals in practice. Null bits/h1/h2 → null.
  */
case class BloomContains(
    bits: Expression, h1: Expression, h2: Expression,
    k: Expression, m: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(bits, h1, h2, k, m)

  override def checkInputDataTypes(): TypeCheckResult =
    (bits.dataType, h1.dataType, h2.dataType, k.dataType, m.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType, IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, long, long, int, long), got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = bits.nullable || h1.nullable || h2.nullable

  override def prettyName: String = BloomContains.Name

  override def eval(input: InternalRow): Any = {
    val b = bits.eval(input)
    val x1 = h1.eval(input)
    val x2 = h2.eval(input)
    if (b == null || x1 == null || x2 == null) null
    else {
      val words = b.asInstanceOf[ArrayData]
      val kk = k.eval(input).asInstanceOf[Int]
      val mm = m.eval(input).asInstanceOf[Long]
      val hh1 = x1.asInstanceOf[Long]
      val hh2 = x2.asInstanceOf[Long]
      var i = 0
      var found = true
      while (found && i < kk) {
        val pos = graft.operators.BloomJoin.position(hh1, hh2, i, mm)
        if ((words.getLong((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
          found = false
        i += 1
      }
      found
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsCode = bits.genCode(ctx)
    val h1Code = h1.genCode(ctx)
    val h2Code = h2.genCode(ctx)
    val kCode = k.genCode(ctx)
    val mCode = m.genCode(ctx)
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val pos = ctx.freshName("pos")
    ev.copy(code =
      code"""
        ${bitsCode.code}
        ${h1Code.code}
        ${h2Code.code}
        ${kCode.code}
        ${mCode.code}
        boolean ${ev.isNull} =
          ${bitsCode.isNull} || ${h1Code.isNull} || ${h2Code.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = true;
          for (int $i = 0; ${ev.value} && $i < ${kCode.value}; $i++) {
            long $c = ${h1Code.value} + ((long) $i) * ${h2Code.value};
            if ($c < 0) $c = ~$c;
            long $pos = $c % ${mCode.value};
            if ((${bitsCode.value}.getLong((int) ($pos >>> 6)) &
                 (1L << (int) ($pos & 63L))) == 0L) {
              ${ev.value} = false;
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomContains =
    copy(bits = newChildren(0), h1 = newChildren(1), h2 = newChildren(2),
      k = newChildren(3), m = newChildren(4))
}

object BloomContains {

  /** SQL-visible name, registered via [[graft.GraftExtensions]]. */
  val Name = "graft_bloom_contains"

  /** Column API; requires a session built with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def contains(bits: Column, h1: Column, h2: Column,
      k: Column, m: Column): Column =
    call_function(Name, bits, h1, h2, k, m)
}
