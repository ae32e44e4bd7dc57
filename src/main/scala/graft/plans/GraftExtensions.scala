package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions for the graft engine: registers the engine's custom
  * Catalyst expressions for SQL use at session build time.
  *
  * Usage:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosine(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("xs_hash"),
      new ExpressionInfo(classOf[XsHash].getName, "xs_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        XsHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("xs_mix"),
      new ExpressionInfo(classOf[XsMix].getName, "xs_mix"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        XsMix(exprs(0), exprs(1))))
  }
}
