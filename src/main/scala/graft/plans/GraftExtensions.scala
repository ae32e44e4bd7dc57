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

  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  /** Positional builders would throw IndexOutOfBoundsException on a wrong
    * SQL argument count; surface a proper invalid-arity message instead.
    */
  private def arity(name: String, n: Int)(exprs: Exprs): Exprs = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Exprs) => {
        val a = arity("vec_dot", 2)(exprs); VecDot(a(0), a(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Exprs) => {
        val a = arity("vec_cosine", 2)(exprs); VecCosine(a(0), a(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("xs_hash"),
      new ExpressionInfo(classOf[XsHash].getName, "xs_hash"),
      (exprs: Exprs) => XsHash(arity("xs_hash", 1)(exprs).head)))
    e.injectFunction((
      new FunctionIdentifier("xs_mix"),
      new ExpressionInfo(classOf[XsMix].getName, "xs_mix"),
      (exprs: Exprs) => {
        val a = arity("xs_mix", 2)(exprs); XsMix(a(0), a(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("accent_fold"),
      new ExpressionInfo(classOf[AccentFold].getName, "accent_fold"),
      (exprs: Exprs) => AccentFold(arity("accent_fold", 1)(exprs).head)))
    e.injectFunction((
      new FunctionIdentifier("phonetic_key"),
      new ExpressionInfo(classOf[PhoneticKey].getName, "phonetic_key"),
      (exprs: Exprs) => PhoneticKey(arity("phonetic_key", 1)(exprs).head)))
  }
}
