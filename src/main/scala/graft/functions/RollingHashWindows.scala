package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over every `window`-byte substring of a
  * string's UTF-8 bytes, as a native codegen'd Catalyst expression:
  * one O(n) pass per document (the roll is an O(1) update), versus the
  * O(n·k) a substring+hash formulation costs. Base 257, arithmetic mod
  * 2^64 (Java long wraparound) — deterministic everywhere.
  *
  * This is the fingerprinting primitive for content-defined chunking and
  * winnowing-style document signatures: downstream takes mins/samples of
  * the window hashes (see
  * [[graft.operators.TextOps.rollingMinFingerprint]]).
  *
  * Strings shorter than `window` bytes yield an empty array.
  */
case class RollingHashWindows(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hash_windows"

  private val Base = 257L

  private lazy val basePow: Long = {
    var p = 1L
    var i = 0
    while (i < window) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < window) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n - window + 1)
      var h = 0L
      var i = 0
      while (i < window) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
      out(0) = h
      while (i < n) {
        h = h * Base + (bytes(i) & 0xFF) - basePow * (bytes(i - window) & 0xFF)
        out(i - window + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |if ($bytes.length < $window) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$bytes.length - $window + 1];
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $window; $i++) { $h = $h * ${Base}L + ($bytes[$i] & 0xFF); }
         |  $out[0] = $h;
         |  for (; $i < $bytes.length; $i++) {
         |    $h = $h * ${Base}L + ($bytes[$i] & 0xFF)
         |        - ${basePow}L * ($bytes[$i - $window] & 0xFF);
         |    $out[$i - $window + 1] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashWindows = copy(child = newChild)
}

object RollingHashWindows {
  def apply(text: Column, window: Int): Column =
    ColumnBridge.column(
      new RollingHashWindows(ColumnBridge.expression(text), window))
}
