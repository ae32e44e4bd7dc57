package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftColumnBridge.AbstractType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PHONETIC BLOCKING KEY — a Soundex-family code with PINNED semantics,
  * as a codegen expression so record-linkage blocking (q143/q396) can
  * bucket "sounds-alike" names instead of share-a-prefix names.
  *
  * The classic US-English Soundex rules, stated exactly (engines differ
  * on edge cases, so the contract is spelled out and the oracle replays
  * THIS contract, not any library's):
  *
  *  1. Only ASCII letters participate; every other character (digits,
  *     punctuation, non-ASCII bytes) is DROPPED before processing — it
  *     neither emits nor separates adjacent codes.
  *  2. The first letter, uppercased, heads the key. No letters → "".
  *  3. Letter codes: B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5,
  *     R→6; vowels A E I O U Y→0; H W→7.
  *  4. Walk the letters after the head keeping `prev` = code of the
  *     last non-H/W letter seen (initialized to the head's code, 7 if
  *     the head is H/W). H/W never emit and never update `prev` (they
  *     are TRANSPARENT: same codes across an H collapse — "Ashcraft" →
  *     A261). A consonant code 1–6 emits iff it differs from `prev`;
  *     vowels emit nothing but reset `prev` (same codes across a vowel
  *     emit twice — "Tymczak" → T522). Every non-H/W letter updates
  *     `prev`.
  *  5. Key = head + first 3 emitted digits, right-padded with '0'.
  *
  * Codegen emits the walk as one primitive byte loop inside whole-stage
  * codegen (multi-byte UTF-8 units have the high bit set on every byte,
  * so the byte loop and a char loop agree); the oracle replays it as a
  * letters-only char unnest + one LAG window over the H/W-filtered
  * sequence. No UDF, no per-row allocation beyond the 4-byte key.
  */
case class PhoneticKey(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "phonetic_key"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PhoneticKey.key(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val oi = ctx.freshName("oi")
      val prev = ctx.freshName("prev")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      s"""
         |byte[] $bytes = $s.getBytes();
         |byte[] $out = new byte[] {'0', '0', '0', '0'};
         |int $oi = 0;
         |int $prev = -1;
         |for (int $i = 0; $i < $bytes.length && $oi < 4; $i++) {
         |  int $b = $bytes[$i] & 0xff;
         |  if ($b >= 'a' && $b <= 'z') $b -= 32;
         |  if ($b < 'A' || $b > 'Z') continue;
         |  int $c = "${PhoneticKey.Map26}".charAt($b - 65) - 48;
         |  if ($oi == 0) {
         |    $out[$oi++] = (byte) $b;
         |    $prev = $c;
         |  } else if ($c != 7) {
         |    if ($c >= 1 && $c != $prev) $out[$oi++] = (byte) ('0' + $c);
         |    $prev = $c;
         |  }
         |}
         |${ev.value} = $oi == 0
         |  ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
         |  : org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PhoneticKey =
    copy(child = newChild)
}

object PhoneticKey {

  /** Letter→code map for A..Z (7 = transparent H/W). */
  private[plans] val Map26 = "01230127022455012623017202"

  /** Reference implementation (tests cross-check codegen against this). */
  def key(s: String): String = {
    val sb = new java.lang.StringBuilder(4)
    var prev = -1
    var i = 0
    while (i < s.length && sb.length < 4) {
      var ch = s.charAt(i).toInt
      if (ch >= 'a' && ch <= 'z') ch -= 32
      if (ch >= 'A' && ch <= 'Z') {
        val c = Map26.charAt(ch - 'A') - '0'
        if (sb.length == 0) {
          sb.append(ch.toChar)
          prev = c
        } else if (c != 7) {
          if (c >= 1 && c != prev) sb.append(('0' + c).toChar)
          prev = c
        }
      }
      i += 1
    }
    if (sb.length == 0) ""
    else {
      while (sb.length < 4) sb.append('0')
      sb.toString
    }
  }
}

object PhoneticExpressions {

  def phoneticKey(c: Column): Column =
    GraftColumnBridge.column(PhoneticKey(GraftColumnBridge.expression(c)))
}
