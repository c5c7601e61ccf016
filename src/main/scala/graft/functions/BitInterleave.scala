package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: bit-interleave of the low `bits` bits of two
  * non-negative longs — result bit 2i is `left`'s bit i, bit 2i+1 is
  * `right`'s bit i. Rows sorted by this key cluster in BOTH dimensions
  * at once, so parquet min/max footer stats prune file scans for
  * predicates on EITHER column — the two-dimensional data-skipping
  * layout a single-column sort cannot give (sorting by A leaves B
  * scattered across every file). Used with
  * [[graft.operators.Scale.writeLayout]] as the `sortCols` key; at
  * 100 TB this is the difference between touching one dimension's file
  * stripe and touching the whole table for the other dimension's
  * queries.
  *
  * Pure bit arithmetic on longs (codegen'd loop, O(bits) per row, no
  * shuffle) — deterministic everywhere, replayable in SQL as a
  * shift/mask sum. Inputs are masked to `bits` bits; negative inputs
  * are therefore treated by their low bits (callers should pass
  * non-negative keys).
  */
case class BitInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_interleave"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitInterleave =
    copy(left = newLeft, right = newRight)
}

object BitInterleave {
  def apply(a: Column, b: Column, bits: Int = 21): Column =
    ColumnBridge.column(new BitInterleave(
      ColumnBridge.expression(a.cast(LongType)),
      ColumnBridge.expression(b.cast(LongType)), bits))
}
