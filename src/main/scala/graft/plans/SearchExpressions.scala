package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Codegen'd binary search over a SORTED long array column.
  *
  * `SortedCountBelow(arr, key)` returns how many elements of `arr` are
  * strictly below `key` — the lower-bound index. The consistent-hash ring
  * lookup ([[graft.operators.Sharding.ringAssign]]) previously computed
  * this as `size(filter(arr, x < key))`: higher-order array functions
  * evaluate their lambda INTERPRETED per element, so a 320-vnode ring
  * costs 320 boxed lambda calls per key (measured 4.5 s for one scan at
  * sf0.1). The binary search is O(log n) inside whole-stage codegen.
  *
  * The caller owns the sortedness contract (ringAssign builds the array
  * via sort_array); on an unsorted array the result is unspecified, same
  * as any binary search.
  */
case class SortedCountBelow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_count_below"

  private def count(arr: ArrayData, key: Long): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(a: Any, k: Any): Any =
    count(a.asInstanceOf[ArrayData], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, key) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getLong($mid) < $key) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SearchExpressions {
  /** Count of elements of sorted long-array `arr` strictly below `key`. */
  def sortedCountBelow(arr: Column, key: Column): Column =
    GraftColumnBridge.column(SortedCountBelow(
      GraftColumnBridge.expression(arr), GraftColumnBridge.expression(key)))
}
