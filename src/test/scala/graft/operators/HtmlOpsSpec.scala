package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Contract edges of [[HtmlOps.htmlExtract]] the planted oracle cannot
  * reach: body-less fragments, script/comment trap ordering, the decode-
  * after-strip rule, density boundaries, and malformed-page degradation. */
class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): Row =
    HtmlOps.htmlExtract(Seq((1L, html)).toDF("doc", "html"), "html")
      .select("title", "text", "n_blocks", "n_dropped").head()

  test("script strings never shred blocks; comments are not content") {
    val r = extract(
      """<html><head><title>T</title></head><body>
        |<script>var a = "</p><p>leak</p>";</script>
        |<p>real</p><!-- <p>ghost</p> --></body></html>""".stripMargin)
    assert(r.getString(1) == "real")
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
  }

  test("decode AFTER strip: an encoded tag survives as text") {
    val r = extract("<body><p>use &lt;script&gt; tags</p></body>")
    assert(r.getString(1) == "use <script> tags")
  }

  test("double-escaped entity decodes one level only") {
    val r = extract("<body><p>a &amp;lt; b</p></body>")
    assert(r.getString(1) == "a &lt; b")
  }

  test("body-less fragment is all content; head is cut when body exists") {
    assert(extract("<p>frag one</p><p>frag two</p>").getString(1)
      == "frag one\nfrag two")
    val full = extract(
      "<html><head><title>Ti</title></head><body><p>only</p></body></html>")
    assert(full.getString(0) == "Ti" && full.getString(1) == "only")
  }

  test("link density: exactly half kept, over half dropped") {
    // anchor 4 chars, total 9 ("link rest") → 4 <= 4.5 kept
    val keep = extract("<body><p><a href='/'>link</a> rest</p></body>")
    assert(keep.getLong(2) == 1L && keep.getLong(3) == 0L)
    // anchor 5, total 9 ("links rest" → 10? use shorter rest): "links res"
    val drop = extract("<body><p><a href='/'>links</a> res</p></body>")
    assert(drop.getString(1) == "" && drop.getLong(3) == 1L)
  }

  test("inline tags stay in-block; br splits a block") {
    val r = extract("<body><p>one <b>bold</b> word</p></body>")
    assert(r.getString(1) == "one bold word")
    val br = extract("<body><p>alpha<br/>beta</p></body>")
    assert(br.getString(1) == "alpha\nbeta" && br.getLong(2) == 2L)
  }

  test("whitespace collapses inside a block; nbsp is space") {
    val r = extract("<body><p>a\n   b&nbsp;&nbsp;c</p></body>")
    assert(r.getString(1) == "a b c")
  }

  test("malformed page degrades, never throws") {
    val r = extract("<body><p>ok<div <p broken <a no close")
    // unterminated tags strip to whitespace-or-text; no exception
    assert(r.getString(1).startsWith("ok"))
  }

  test("unclosed script eats to end of page (lazy close never found)") {
    // contract: script removal needs its close tag; without one the
    // regex does not match and the script TEXT falls through to blocks
    // (tags stripped) — degraded, not thrown
    val r = extract("<body><p>pre</p><script>var x = 1;</body></html>")
    assert(r.getString(1).contains("pre"))
  }

  test("empty and whitespace-only blocks are neither kept nor dropped") {
    val r = extract("<body><div> </div><p></p><p>x y</p></body>")
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
  }

  test("title entity-decoded and normalized; absent title is empty") {
    val r = extract(
      "<html><head><title>  A &amp;  B </title></head><body><p>t</p></body></html>")
    assert(r.getString(0) == "A & B")
    assert(extract("<body><p>t</p></body>").getString(0) == "")
  }
}
