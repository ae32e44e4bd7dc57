package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftColumnBridge.AbstractType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 64-bit string hash: an xorshift64 fold over the UTF-8
  * bytes.
  *
  * ```
  * h = 0x9E3779B97F4A7C15
  * for each byte b: h ^= b; h ^= h<<13; h ^= h>>>7; h ^= h<<17
  * ```
  *
  * Exists so the dedup operators (minhash / simhash / n-gram shingles) can
  * be replayed EXACTLY by the DuckDB oracle: every step is xor/shift, which
  * the oracle reproduces in HUGEINT mod-2^64 arithmetic (`xxhash64` has no
  * cross-engine twin). Quality is xorshift-grade: measured zero collisions
  * and 48–52% per-bit balance over a 7.7k word-like vocabulary — ample for
  * LSH bucketing. Codegen emits the fold as a tight primitive loop inside
  * whole-stage codegen; no UDF, no boxing.
  */
case class XsHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "xs_hash"
  // fail at ANALYSIS on a non-string input, not with a codegen/cast error
  // deep inside a job
  override def inputTypes: Seq[AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    XsHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0x9E3779B97F4A7C15L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h ^= $h << 13;
         |  $h ^= $h >>> 7;
         |  $h ^= $h << 17;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XsHash =
    copy(child = newChild)
}

/** One portable mix step over two longs: `xorshift64(acc ^ v)`.
  *
  * Used to fold several 64-bit values (e.g. an LSH band's signature slice
  * plus the band index) into one band key. A Column-level formulation of
  * the three xorshift steps would reference each intermediate twice and
  * the optimizer would inline the whole accumulator chain 8^depth times
  * (the engine's known HOF-inlining trap); as a single expression the
  * generated code is three sequential statements per fold step.
  */
case class XsMix(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "xs_mix"
  // ImplicitCast (not strict ExpectsInputTypes): integer literals widen to
  // long losslessly, matching every built-in hash function
  override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    XsMix.mix(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val h = ctx.freshName("h")
      s"""
         |long $h = $a ^ $b;
         |$h ^= $h << 13;
         |$h ^= $h >>> 7;
         |$h ^= $h << 17;
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XsMix =
    copy(left = newLeft, right = newRight)
}

object XsMix {

  /** Reference implementation (tests cross-check codegen against this). */
  def mix(acc: Long, v: Long): Long = {
    var h = acc ^ v
    h ^= h << 13
    h ^= h >>> 7
    h ^= h << 17
    h
  }
}

object XsHash {

  /** Reference implementation (tests cross-check codegen against this). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h ^= h << 13
      h ^= h >>> 7
      h ^= h << 17
      i += 1
    }
    h
  }
}

object TextHashExpressions {

  /** Column-level portable hash backed by the codegen expression. */
  def xsHash(c: Column): Column =
    GraftColumnBridge.column(XsHash(GraftColumnBridge.expression(c)))

  /** Column-level portable mix step: `xorshift64(acc ^ v)`. */
  def xsMix(acc: Column, v: Column): Column =
    GraftColumnBridge.column(
      XsMix(GraftColumnBridge.expression(acc), GraftColumnBridge.expression(v)))

  /** Register for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xs_hash", exprs => XsHash(exprs.head), "built-in")
}
