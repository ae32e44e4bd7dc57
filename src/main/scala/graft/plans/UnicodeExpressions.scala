package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftColumnBridge.AbstractType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding: canonical decomposition (NFD), drop every combining
  * mark (Unicode category Mn), recompose (NFC) — `'café' → 'cafe'`,
  * `'öü' → 'ou'`. The text-normalization primitive for dedup keys,
  * search-term canonicalization and language-agnostic fingerprints.
  *
  * Matches DuckDB's `strip_accents` on all canonically-decomposable
  * accents (the Latin-1/Latin-Extended set the corpus pipeline meets) —
  * what the oracle gate replays. Non-decomposable letterforms (ø, đ, ß)
  * are NOT folded by either definition used here.
  *
  * ASCII fast path: corpus text is overwhelmingly ASCII, which can carry
  * no combining marks — detected with one byte scan on the UTF8String
  * (no decode, no Normalizer allocation), so the common case costs a
  * memchr-style loop inside whole-stage codegen.
  */
object AccentFoldImpl {

  def fold(s: UTF8String): UTF8String = {
    // numBytes == numChars ⟺ pure ASCII ⟺ nothing to fold
    if (s.numBytes() == s.numChars()) s
    else {
      val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }
  }
}

/** Codegen'd accent folding: the generated code is one static call into
  * [[AccentFoldImpl]], keeping the expression inside whole-stage codegen.
  */
case class AccentFold(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    AccentFoldImpl.fold(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AccentFoldImpl.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): AccentFold =
    copy(child = newChild)
}

object UnicodeExpressions {

  /** Column-level accent folding backed by the codegen expression. */
  def accentFold(c: Column): Column =
    GraftColumnBridge.column(AccentFold(GraftColumnBridge.expression(c)))
}
