package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-script codepoint counts — the native expression the r14
  * q198 design note promised "if script profiling ever became the hot
  * path" (it did: the classification subtree sits under q198, q202 and
  * the q203/q204 routed-trainer builds, and the seven separate
  * `regexp_count(utext, '\p{IsXxx}')` scans were the dominant cost of
  * the routing family's readouts — r17 stage dissection: ~0.5–1.0 s of
  * q202's 1.0 s).
  *
  * One pass over the UTF-8 bytes ([[TokensOf]]'s walk): ASCII classifies
  * inline (letters are script Latin, everything else ASCII is Common —
  * never counted), multi-byte sequences decode to one codepoint for a
  * `Character.UnicodeScript.of` lookup. Returns the seven counts in
  * [[ScriptCountsOf.Scripts]] order (TextOps' alphabetical class list).
  *
  * Count equivalence with the regex form: a single-codepoint character
  * class matches each qualifying codepoint exactly once (supplementary
  * codepoints once, not per surrogate), and Java regex `\p{IsXxx}`
  * script classes read the same Unicode script data `UnicodeScript.of`
  * does — verified on a mixed fixture incl. supplementary-plane and
  * combining-mark codepoints (ExpressionsSpec pins it); the q198/q202/
  * q203/q204 oracles keep the regexp_count form, so the driver's hash
  * gate re-proves the equivalence on every run.
  */
case class ScriptCountsOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"

  override protected def nullSafeEval(s: Any): Any =
    ScriptCountsOf.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.ScriptCountsOf.count($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptCountsOf {
  /** The seven script classes, in TextOps' alphabetical order — the
    * array slots of [[count]]'s result. */
  val Scripts: Seq[String] =
    Seq("arabic", "cyrillic", "devanagari", "greek", "han", "hebrew",
      "latin")

  private val ScriptEnums: Array[Character.UnicodeScript] =
    Scripts.map(n => Character.UnicodeScript.forName(n.capitalize)).toArray

  /** Seven script counts over one UTF-8 byte walk. Invalid sequences
    * advance one byte uncounted (the regex path sees them as U+FFFD —
    * script Unknown, also uncounted). */
  def count(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](ScriptEnums.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var step = 1
      if ((b & 0x80) == 0) {
        // ASCII: only letters carry script Latin; digits/punct/space
        // are Common/inherited — never one of the seven
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
          counts(6) += 1
      } else {
        var cp = -1
        var len = 0
        if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
        else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
        else if ((b & 0xF8) == 0xF0) { cp = b & 0x07; len = 4 }
        if (cp >= 0 && i + len <= bytes.length) {
          var k = 1
          while (k < len && cp >= 0) {
            val c = bytes(i + k)
            if ((c & 0xC0) == 0x80) cp = (cp << 6) | (c & 0x3F)
            else cp = -1
            k += 1
          }
        } else cp = -1
        // guard UnicodeScript.of's IllegalArgumentException: an invalid
        // lead byte (0xF5–0xF7) can decode past U+10FFFF — the regex
        // path saw such bytes as U+FFFD (script Unknown, uncounted)
        if (cp > 0x10FFFF) cp = -1
        // reject non-minimal (overlong) encodings and 3-byte-encoded
        // surrogates (r17 ADVICE): the regex path decodes both to
        // U+FFFD (uncounted); e.g. 0xC1 0xA1 must NOT count as Latin 'a'
        if (cp >= 0 &&
            ((len == 2 && cp < 0x80) || (len == 3 && cp < 0x800) ||
              (len == 4 && cp < 0x10000) ||
              (cp >= 0xD800 && cp <= 0xDFFF))) cp = -1
        if (cp >= 0) {
          step = len
          val sc = Character.UnicodeScript.of(cp)
          var j = 0
          while (j < ScriptEnums.length) {
            if (ScriptEnums(j) eq sc) { counts(j) += 1; j = ScriptEnums.length }
            else j += 1
          }
        }
      }
      i += step
    }
    new GenericArrayData(counts.map(Long.box))
  }

  /** Column form: `array<long>` of the seven counts in [[Scripts]]
    * order. */
  def scriptCounts(text: Column): Column =
    Bridge.column(ScriptCountsOf(Bridge.expression(text)))
}
