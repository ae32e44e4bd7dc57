package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd per-cell unsigned-byte sums over a binary column.
  *
  * `ByteCellSums(bin, n)` returns an n-element long array whose cell i is
  * the exact sum of unsigned byte values in slice
  * [⌊len·i/n⌋, ⌊len·(i+1)/n⌋) of `bin` — the perceptual-hash cell census
  * ([[graft.operators — q237]]). The previous formulation walked the HEX
  * string with `transform`/`aggregate`/`conv`/`substring`: higher-order
  * array functions evaluate their lambda INTERPRETED per element, so a
  * 2 KB document cost ~2k boxed conv+substring calls (measured: one
  * 4.7 s job holding ~80% of q237's board entry at sf0.1). This is the
  * same per-element-lambda trap, and the same fix, as
  * [[SortedCountBelow]]. Boundaries use long multiply + integer divide,
  * identical to the old `floor(len·i/n)` double path for any len·n
  * below 2^53.
  */
case class ByteCellSums(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_cell_sums"

  override def nullSafeEval(bin: Any, n: Any): Any = {
    val b = bin.asInstanceOf[Array[Byte]]
    val cells = n.asInstanceOf[Int]
    val out = new Array[Long](cells)
    val len = b.length.toLong
    var i = 0
    while (i < cells) {
      val start = len * i / cells
      val end = len * (i + 1) / cells
      var s = 0L
      var j = start
      while (j < end) { s += (b(j.toInt) & 0xff); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bin, n) => {
      val out = ctx.freshName("out")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      s"""
         |long[] $out = new long[$n];
         |long $len = (long) $bin.length;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $start = $len * $i / $n;
         |  long $end = $len * ($i + 1) / $n;
         |  long $s = 0L;
         |  for (long $j = $start; $j < $end; $j++) {
         |    $s += ($bin[(int) $j] & 0xff);
         |  }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BytesExpressions {
  /** n-cell exact unsigned-byte slice sums of binary column `bin`. */
  def byteCellSums(bin: Column, n: Column): Column =
    GraftColumnBridge.column(ByteCellSums(
      GraftColumnBridge.expression(bin), GraftColumnBridge.expression(n)))
}
