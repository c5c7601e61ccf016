package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter, col)` as a native codegen'd predicate:
  * membership of a string column in a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * The filter rides to executors as a plan reference object
  * (`addReferenceObj`) — exactly how Spark ships its own runtime bloom
  * filters — so the per-row cost is a few xxhash probes over the UTF-8
  * bytes with no driver round-trip and no join. This is the membership
  * half of the sketch-based incremental dedup
  * ([[graft.operators.Scale.bloomIncrementalDedup]]): a 100 TB corpus'
  * fingerprint index doesn't broadcast, but its ~1-byte-per-key bloom
  * summary does.
  *
  * Bytes hashed are the raw UTF-8 of the value — the same bytes
  * `DataFrameStatFunctions.bloomFilter` feeds `putString`/`putBinary`
  * when building from a string column, so membership NEVER yields a
  * false negative against a filter built from the same column.
  */
case class BloomMightContain(filter: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bf.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point. */
  def mightContain(filter: BloomFilter, c: Column): Column =
    ColumnBridge.column(BloomMightContain(filter, ColumnBridge.expression(c)))
}
