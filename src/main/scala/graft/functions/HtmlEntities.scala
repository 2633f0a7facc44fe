package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** General HTML character-reference decoding — ONE linear pass per
  * string, replacing the fixed replace() chain that could only handle a
  * named allowlist. Real pages lean on numeric references heavily
  * (`&#8217;` curly apostrophe, `&#8211;` en dash, `&#xe9;` é …), so an
  * extraction stage that passes them through verbatim leaves reference
  * junk in the training text.
  *
  * Contract (single pass — a decoded `&amp;lt;` yields the literal
  * `&lt;` it denotes, never a re-decoded `<`, matching the old chain's
  * amp-last rule):
  *  - `&#NNN;` (decimal) and `&#xHHH;`/`&#XHHH;` (hex) decode to their
  *    code point, for valid scalar values (0 < cp ≤ 0x10FFFF, not a
  *    surrogate); NBSP (160) decodes to a PLAIN SPACE — the
  *    whitespace-normalization contract treats it as spacing, and
  *    `\s+` collapse would miss U+00A0;
  *  - the named core decodes: `&amp; &lt; &gt; &quot; &apos;` and
  *    `&nbsp;` (→ space);
  *  - anything else (`&unknown;`, `&#;`, `&#xG;`, out-of-range, a bare
  *    `&`, an unterminated reference) is copied VERBATIM — XML-lite
  *    degradation, never a throw.
  */
object HtmlEntities {

  case class HtmlEntityDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StringType

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"html_entity_decode needs a string arg, got ${child.dataType.simpleString}")

    // the named table as parallel arrays — probed per '&' in the hot
    // loop, so no per-call closure/tuple allocation
    private val namedLits =
      Array("&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;")
    private val namedRepls = Array('&', '<', '>', '"', '\'', ' ')

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (s.indexOf('&') < 0) return input // fast path: nothing to decode
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c != '&') { out.append(c); i += 1 }
        else if (i + 2 < n && s.charAt(i + 1) == '#') {
          val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
          val d0 = if (hex) i + 3 else i + 2
          var j = d0
          var cp = 0L
          val radix = if (hex) 16 else 10
          var ok = true
          while (j < n && s.charAt(j) != ';' && j - d0 < 8) {
            val dv = Character.digit(s.charAt(j), radix)
            if (dv < 0) { ok = false; j = n } else { cp = cp * radix + dv; j += 1 }
          }
          ok = ok && j < n && s.charAt(j) == ';' && j > d0 &&
            cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)
          if (ok) {
            if (cp == 160) out.append(' ')
            else out.appendCodePoint(cp.toInt)
            i = j + 1
          } else { out.append(c); i += 1 }
        } else {
          var m = 0
          var hit = -1
          while (hit < 0 && m < namedLits.length) {
            if (s.regionMatches(i, namedLits(m), 0, namedLits(m).length))
              hit = m
            m += 1
          }
          if (hit >= 0) { out.append(namedRepls(hit)); i += namedLits(hit).length }
          else { out.append(c); i += 1 }
        }
      }
      UTF8String.fromString(out.toString)
    }

    override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
      copy(child = newChild)

    override def prettyName: String = "html_entity_decode"
  }

  def html_entity_decode(c: Column): Column =
    Bridge.column(HtmlEntityDecode(Bridge.expression(c)))
}
