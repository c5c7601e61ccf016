package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayDotProduct

/** SQL-surface registration for the engine's custom Catalyst expressions,
  * so `spark.sql("SELECT array_dot(a, b) ...")` works alongside the
  * Column API. Lives in the sql subpackage for `sessionState` access;
  * cluster deployments get the same set via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctionRegistry {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
                      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
     new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
     (children: Seq[Expression]) => {
       require(children.length == 2, "array_dot takes exactly 2 arguments")
       ArrayDotProduct(children.head, children(1))
     }))

  /** Idempotently register on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
