package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftColumnBridge.AbstractType
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** d=2 HILBERT-CURVE index — the space-filling curve whose every step is a
  * unit grid move, unlike the Morton/z-order interleave (Layout.zorderValue)
  * which teleports across the plane at power-of-two boundaries. For file
  * clustering that means a contiguous Hilbert range maps to a tighter
  * bounding box, so per-file min/max stats are tighter on BOTH keys and a
  * range probe opens fewer files — the edge grows with key skew, where
  * Morton's jump seams land inside hot regions (the q184 OPTIMIZE family's
  * motivation; LayoutSpec measures the files-opened comparison).
  *
  * The algorithm is the canonical xy2d bit walk: for each level s from the
  * top bit down, the quadrant (rx, ry) contributes s²·((3·rx) XOR ry) to
  * the index and the plane is flipped/transposed (flip with the constant
  * n−1) so the child quadrant re-enters in canonical orientation. Pure
  * integer shift/mask/xor — codegen emits the loop as straight-line Java
  * inside whole-stage codegen, and the DuckDB oracle replays it as a
  * list_reduce fold over the same levels (SparkEntry.hilbertSql).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31,
    s"hilbert index of $bits-bit keys needs 2*bits <= 62 to fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $xv & ${mask}L;
         |long $y = $yv & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = ${mask}L - $x;
         |      $y = ${mask}L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {
  /** Interpreted twin of the codegen loop (also the spec's reference). */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object CurveExpressions {
  /** Column-level d=2 Hilbert index backed by the codegen expression. */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex2(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))
}
