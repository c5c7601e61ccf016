package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Q40 fixed-point binary logarithm of a positive BIGINT, as a native
  * expression — the column form of
  * [[graft.operators.Multimodal.log2Fp]]'s square-and-shift algorithm
  * (integer part = top-bit position; 40 truncated fraction bits from
  * "square the Q60 mantissa, emit 1 and halve when it crosses 2").
  * Pure integer arithmetic, no libm: a DuckDB recursive CTE with
  * HUGEINT replays it bit-for-bit, which is what makes entropy-style
  * aggregates oracle-checkable where `ln` doubles are not (the
  * [[graft.operators.TextOps.tokenEntropy]] use).
  *
  * Inputs < 1 yield null (log undefined — null, not a sentinel, so a
  * bad upstream count surfaces as a null entropy rather than a wrong
  * one). Codegen and interpreted paths both call the one static
  * [[Log2Fp.compute]], so they cannot drift.
  */
case class Log2Fp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "log2_fp"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v < 1L) null else Log2Fp.compute(v)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Log2Fp.compute($c);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Log2Fp = copy(child = newChild)
}

object Log2Fp {
  /** The shared scalar kernel — both eval paths route here. */
  def compute(v: Long): Long = {
    val ip = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var x = BigInt(v) << (60 - ip) // Q60 mantissa in [1, 2)
    val two = BigInt(1) << 61
    var frac = 0L
    var k = 0
    while (k < 40) {
      x = (x * x) >> 60
      frac <<= 1
      if (x >= two) { x >>= 1; frac |= 1L }
      k += 1
    }
    (ip.toLong << 40) | frac
  }

  def apply(v: Column): Column =
    ColumnBridge.column(new Log2Fp(ColumnBridge.expression(v)))
}
