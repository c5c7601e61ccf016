package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot(array<double>, array<double>)` as a native Catalyst expression
  * with whole-stage codegen: one tight primitive loop per row instead of
  * the interpreted `aggregate(zip_with(...))` fold (which allocates a
  * zipped array and evaluates a lambda per element).
  *
  * The summation order is exactly the HOF fold's (ascending index, double
  * accumulation), so results are bit-identical with both the previous
  * formulation and the DuckDB oracle's `list_inner_product`.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  // Null on length mismatch or any null element (see nullSafeEval), even
  // when both children are non-nullable.
  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  /** Mismatched lengths or a null element yield NULL — matching the
    * `aggregate(zip_with(...))` fold this replaces (zip_with null-pads the
    * shorter side and the fold propagates null) and surfacing truncated/
    * corrupt embeddings instead of silently scoring a partial product.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per call site: two array_dot calls can share one
      // generated scope when their children are non-nullable, and fixed
      // variable names would fail Janino compilation (silent interpreted
      // fallback for the whole stage).
      val n = ctx.freshName("adpN")
      val acc = ctx.freshName("adpAcc")
      val i = ctx.freshName("adpI")
      val ok = ctx.freshName("adpOk")
      s"""
         |int $n = $a.numElements();
         |boolean $ok = $n == $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $ok && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $ok = false; }
         |  else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |if ($ok) { ${ev.value} = $acc; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
