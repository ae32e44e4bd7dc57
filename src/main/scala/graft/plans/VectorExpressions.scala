package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays (`array<float>` /
  * `array<double>` in any combination).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation: HOFs evaluate interpreted with per-element boxing, while
  * this expression generates a primitive `for` loop inside whole-stage
  * codegen. Accumulation is left-to-right in double — the same fold order
  * as the HOF version and the engine's oracle, so results are identical.
  *
  * Precondition: array elements are non-null (embedding vectors). Shorter
  * array bounds the loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other =>
      throw new IllegalArgumentException(s"vec_dot expects arrays, got $other")
  }

  @transient private lazy val getL = accessor(elemType(left))
  @transient private lazy val getR = accessor(elemType(right))

  private def accessor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case other =>
      throw new IllegalArgumentException(s"vec_dot: unsupported element $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getL(x, i) * getR(y, i); i += 1 }
    s
  }

  private def javaGetter(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case other =>
      throw new IllegalArgumentException(s"vec_dot: unsupported element $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${javaGetter(elemType(left), a, i)} * ${javaGetter(elemType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot, |a|² and |b|² accumulated in ONE loop
  * (vs three separate loops for dot/norm/norm), then
  * `dot / (sqrt(na) * sqrt(nb))`. Same per-accumulator fold order as the
  * unfused form, so results are bit-identical to
  * `VecDot(a,b) / (sqrt(VecDot(a,a)) * sqrt(VecDot(b,b)))`.
  * Returns NaN for a zero vector (0/0), like the unfused form.
  */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other =>
      throw new IllegalArgumentException(s"vec_cosine expects arrays, got $other")
  }

  @transient private lazy val getL = VecCosine.accessor(elemType(left))
  @transient private lazy val getR = VecCosine.accessor(elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = getL(x, i)
      val yv = getR(y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def javaGetter(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other =>
      throw new IllegalArgumentException(s"vec_cosine: unsupported element $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${javaGetter(elemType(left), a, i)};
         |  double $yv = ${javaGetter(elemType(right), b, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosine {
  private[plans] def accessor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case other =>
      throw new IllegalArgumentException(s"vec_cosine: unsupported element $other")
  }
}

/** Fused squared Euclidean distance: Σ (aᵢ - bᵢ)², one primitive loop.
  * This is the metric a product-quantization codebook is trained and
  * probed with (Lloyd's mean-recompute step minimizes exactly this), so
  * it gets the same codegen treatment as dot/cosine. Left-to-right fold
  * in double — the oracle replays the identical association, and since
  * each term is a single subtract+multiply the result is bit-identical
  * cross-engine. Never NaN for finite non-null inputs (unlike cosine on
  * a zero vector).
  */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other =>
      throw new IllegalArgumentException(s"vec_l2sq expects arrays, got $other")
  }

  @transient private lazy val getL = VecCosine.accessor(elemType(left))
  @transient private lazy val getR = VecCosine.accessor(elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = getL(x, i) - getR(y, i)
      s += d * d
      i += 1
    }
    s
  }

  private def javaGetter(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other =>
      throw new IllegalArgumentException(s"vec_l2sq: unsupported element $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${javaGetter(elemType(left), a, i)} - ${javaGetter(elemType(right), b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column-level dot product backed by the codegen expression. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-level fused cosine backed by the codegen expression. */
  def vecCosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecCosine(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-level fused squared-L2 backed by the codegen expression. */
  def vecL2Sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecL2Sq(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register the vector functions for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => VecCosine(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VecL2Sq(exprs(0), exprs(1)), "built-in")
  }
}
