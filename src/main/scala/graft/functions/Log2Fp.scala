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
  /** The shared scalar kernel — both eval paths route here.
    *
    * Long-only square-and-shift, bit-identical to the original BigInt
    * form (MultimodalSpec pins it against a BigInt reference): the Q60
    * mantissa x sits in [2^60, 2^61), so x*x < 2^122 and the truncated
    * `(x*x) >> 60` is reassembled from `Math.multiplyHigh` (the intrinsic
    * 128-bit product's top half) as `(hi << 4) | (lo >>> 60)` — always
    * < 2^62, signed-safe throughout. The BigInt version allocated two
    * BigIntegers per iteration × 40 iterations per call × one call per
    * DISTINCT TOKEN per document in [[TokenSummary]]'s entropy pass:
    * ~10^9 allocations at 5 M docs, measured as ~22 busy cores for
    * minutes in the sf100 dress rehearsal's quality gate. Exact powers
    * of two (every h=1 token count — the bulk of a Zipfian histogram's
    * distinct entries) short-circuit to `ip << 40`: their mantissa is
    * exactly 1.0, every square stays 1.0, and all 40 fraction bits are
    * provably zero.
    */
  def compute(v: Long): Long = {
    val ip = 63 - java.lang.Long.numberOfLeadingZeros(v)
    if ((v & (v - 1L)) == 0L) return ip.toLong << 40
    // Q60 mantissa in [1, 2); BigInt's `<< (60 - ip)` right-shifts when
    // ip > 60, and v > 0 makes floor == logical shift.
    var x = if (ip <= 60) v << (60 - ip) else v >>> (ip - 60)
    val two = 1L << 61
    var frac = 0L
    var k = 0
    while (k < 40) {
      val lo = x * x
      x = (Math.multiplyHigh(x, x) << 4) | (lo >>> 60)
      frac <<= 1
      if (x >= two) { x >>>= 1; frac |= 1L }
      k += 1
    }
    (ip.toLong << 40) | frac
  }

  def apply(v: Column): Column =
    ColumnBridge.column(new Log2Fp(ColumnBridge.expression(v)))
}
