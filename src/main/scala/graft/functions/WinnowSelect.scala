package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types._

/** Winnowing selection (Schleimer–Wilkerson–Aiken) over an array of
  * window hashes, as a native codegen'd expression: for every run of
  * `w` consecutive hashes, select the minimal (hash, position) pair
  * (leftmost position on hash ties), and return the distinct selected
  * pairs as `array<struct<h: long, i: int>>` in window order.
  *
  * This is the per-document-local half of
  * [[graft.operators.TextOps.winnowFingerprints]]. A monotonic deque
  * makes it one O(n) pass — each index is pushed and popped at most
  * once — versus the O(n·w) of evaluating every window's min
  * independently, and versus the corpus-sized ×w explode+shuffle of a
  * relational formulation (the selection has no cross-document
  * dependency, so no shuffle is warranted at all).
  *
  * Arrays shorter than `w` yield an empty array. Tie/dedup semantics
  * match the relational form exactly: ties keep the earliest position
  * (struct-min ordering), and a pair selected by several overlapping
  * windows — necessarily consecutive ones — is emitted once.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "w must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("i", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val n = hs.length
    if (n < w) new GenericArrayData(Array.empty[Any])
    else {
      val dq = new Array[Int](n)
      var qh = 0; var qt = 0
      val out = new Array[Any](n - w + 1)
      var m = 0
      var lastSel = -1
      var i = 0
      while (i < n) {
        // strict '>' keeps the earliest index on hash ties → leftmost min
        while (qt > qh && hs(dq(qt - 1)) > hs(i)) qt -= 1
        dq(qt) = i; qt += 1
        val p = i - w + 1
        if (p >= 0) {
          while (dq(qh) < p) qh += 1
          val s = dq(qh)
          if (s != lastSel) {
            out(m) = new GenericInternalRow(
              Array[Any](hs(s), s))
            m += 1; lastSel = s
          }
        }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], m))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      val n = ctx.freshName("n")
      val dq = ctx.freshName("dq")
      val qh = ctx.freshName("qh")
      val qt = ctx.freshName("qt")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      s"""
         |long[] $hs = $c.toLongArray();
         |int $n = $hs.length;
         |if ($n < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  int[] $dq = new int[$n];
         |  int $qh = 0; int $qt = 0;
         |  Object[] $out = new Object[$n - $w + 1];
         |  int $m = 0; int $last = -1;
         |  for (int $i = 0; $i < $n; $i++) {
         |    while ($qt > $qh && $hs[$dq[$qt - 1]] > $hs[$i]) $qt--;
         |    $dq[$qt++] = $i;
         |    int $p = $i - $w + 1;
         |    if ($p >= 0) {
         |      while ($dq[$qh] < $p) $qh++;
         |      int $s = $dq[$qh];
         |      if ($s != $last) {
         |        $out[$m++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |          new Object[]{ Long.valueOf($hs[$s]), Integer.valueOf($s) });
         |        $last = $s;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $m));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

object WinnowSelect {
  def apply(hashes: Column, w: Int): Column =
    ColumnBridge.column(
      new WinnowSelect(ColumnBridge.expression(hashes), w))
}
