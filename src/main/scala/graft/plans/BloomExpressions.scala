package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a broadcast filter.
  *
  * Replaces the Scala-UDF formulation of the pre-join prune: a UDF boxes
  * every key and breaks the whole-stage-codegen span around the filter,
  * while this expression inlines `bloom.mightContainLong(key)` into the
  * generated loop. The broadcast handle ships per-task (cheap); the filter
  * itself is resolved from the broadcast ONCE per codegen object, not per
  * row.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBc", bloom, bcCls)
    val filter = ctx.addMutableState(bfCls, "bloomFilter",
      v => s"$v = ($bfCls) $ref.value();")
    defineCodeGen(ctx, ev, c => s"$filter.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  /** `key` is probed against the broadcast filter; false positives are
    * expected (the caller's exact join removes them), false negatives never
    * occur — the contract that makes bloom pre-filtering result-exact.
    */
  def mightContainLong(key: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(key), bloom))
}
