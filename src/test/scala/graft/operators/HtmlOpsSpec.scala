package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

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

  test("numeric references: decimal, hex, nbsp-to-space, malformed verbatim") {
    val r = extract(
      "<body><p>it&#8217;s &#xe9;t&#233; &#160;here &#; &#xG; &#999999999; x</p></body>")
    assert(r.getString(1) == "it’s été here &#; &#xG; &#999999999; x")
  }

  test("null html degrades to null outputs, never throws") {
    val df = HtmlOps.htmlExtract(
      Seq((1L, Option.empty[String]), (2L, Some("<body><p>ok</p></body>")))
        .toDF("doc", "html"), "html")
      .orderBy("doc").collect()
    assert(df(0).isNullAt(1) && df(0).isNullAt(2))
    assert(df(1).getString(2) == "ok")
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

  test("unclosed script swallows to end of page (browser semantics)") {
    // matches what browsers do with an unclosed <script>, and what keeps
    // span removal linear-time: content BEFORE the opener survives, the
    // script text and everything after it are gone
    val r = extract("<body><p>pre</p><script>var x = 1;<p>after</p>")
    assert(r.getString(1) == "pre")
  }

  test("unclosed comment swallows to end; closed one does not") {
    assert(extract("<body><p>a</p><!-- open <p>b</p>").getString(1) == "a")
    assert(extract("<body><p>a</p><!-- c --><p>b</p>").getString(1)
      == "a\nb")
  }

  test("nested anchor: the innermost element wins (linear scan)") {
    val got = links(
      "<body><a href=\"/outer\">x <a href=\"/inner\">y</a></a></body>")
    assert(got.map(_._2) == Seq("/inner") && got.head._3 == "y")
  }

  test("empty and whitespace-only blocks are neither kept nor dropped") {
    val r = extract("<body><div> </div><p></p><p>x y</p></body>")
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
  }

  private def links(html: String, base: String = "http://h.com/a/b") =
    HtmlOps.extractLinks(
      Seq((1L, base, html)).toDF("doc", "page_url", "html"), "html",
      "page_url")
      .select("link_idx", "href", "anchor", "url", "dst_host").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSeq

  test("link extraction: document order, quotes, script/comment removal") {
    val got = links(
      """<body><script>var x = '<a href="/ghost">g</a>';</script>
        |<a href="/one">first</a><!-- <a href="/two">c</a> -->
        |<a href='/three'>third <b>bold</b></a>
        |<a href=/unquoted>skipped</a>
        |<a name="no-href">skipped too</a></body>""".stripMargin)
    assert(got.map(_._2) == Seq("/one", "/three"))
    assert(got.map(_._3) == Seq("first", "third bold"))
    assert(got.map(_._1) == Seq(0L, 1L))
    assert(got.forall(_._5.contains("h.com")))
  }

  test("resolution: relative, query preserved, dot segments, root ..") {
    val got = links(
      """<body><a href="c?q=1#z">rel-q</a>
        |<a href="../../../up">over-pop</a>
        |<a href="./x/../y">dots</a></body>""".stripMargin)
      .map(_._4.orNull)
    assert(got(0) == "http://h.com/a/c?q=1#z")
    // base dir /a/, three ".." pop past root and stop there
    assert(got(1) == "http://h.com/up")
    assert(got(2) == "http://h.com/a/y")
  }

  test("resolution: absolute, protocol-relative, opaque schemes, fragment") {
    val got = links(
      """<body><a href="https://x.org/p">abs</a>
        |<a href="//cdn.x.org/q">pr</a>
        |<a href="mailto:a@b.c">m</a>
        |<a href="javascript:void(0)">j</a>
        |<a href="#top">f</a></body>""".stripMargin)
    assert(got(0)._4.contains("https://x.org/p") &&
      got(0)._5.contains("x.org"))
    assert(got(1)._4.contains("http://cdn.x.org/q") &&
      got(1)._5.contains("cdn.x.org"))
    assert(got(2)._4.isEmpty && got(3)._4.isEmpty && got(4)._4.isEmpty)
    assert(got(2)._2 == "mailto:a@b.c")
  }

  test("uppercase scheme is absolute; dst_host lowercases") {
    val got = links("<body><a href=\"HTTP://EX.COM/Page\">u</a></body>")
    assert(got(0)._4.contains("HTTP://EX.COM/Page"))
    assert(got(0)._5.contains("ex.com"))
  }

  test("resolution against a path-less base") {
    val got = links("<body><a href=\"r\">r</a></body>", "http://h.com")
    assert(got(0)._4.contains("http://h.com/r"))
  }

  test("directory references keep their trailing slash (RFC 3986 §5.2.4)") {
    val got = links(
      """<body><a href="/a/b/">abs-dir</a>
        |<a href="sub/">rel-dir</a>
        |<a href="x/..">pop-dir</a>
        |<a href="x/.">dot-dir</a>
        |<a href="/">root</a></body>""".stripMargin)
      .map(_._4.orNull)
    assert(got(0) == "http://h.com/a/b/")
    assert(got(1) == "http://h.com/a/sub/")
    assert(got(2) == "http://h.com/a/") // /a/x/.. → /a/
    assert(got(3) == "http://h.com/a/x/")
    assert(got(4) == "http://h.com/") // root never doubles
  }

  test("query-only href keeps the FULL base path (RFC 3986 §5.3)") {
    val got = links(
      "<body><a href=\"?page=2\">next</a></body>", "http://h.com/list/b")
    assert(got(0)._4.contains("http://h.com/list/b?page=2"))
  }

  test("data-href is not an href; the real attribute wins") {
    val got = links(
      "<body><a data-href=\"/ghost\" href='/real'>t</a></body>")
    assert(got(0)._2 == "/real")
    assert(got(0)._4.contains("http://h.com/real"))
  }

  test("adversarial single-block unclosed-anchor page stays linear") {
    // no block-level tags ⇒ the whole page is ONE density-judged block;
    // ~40k unclosed `<a` openers over ~800 KB was the O(anchors × block
    // size) shape the old whole-block extract_all scan blew up on
    // (minutes per page) — the split-at-opener scan finishes in well
    // under a second and judges the block by its CLOSED anchors only
    val openers = Array.fill(50000)("<a href=\"/x\">w").mkString(" ")
    val page = s"<body>real text here $openers <a href=\"/y\">tail</a></body>"
    assert(page.length > 700000)
    val r = extract(page)
    // unclosed openers contribute their text to the block but not to the
    // anchor tally; only "tail" is closed anchor text, so density keeps it
    assert(r.getLong(2) == 1L && r.getString(1).startsWith("real text here"))
  }

  test("bloom-fronted frontier == exact frontier, any fpp; empty seen-set") {
    val pages = Seq(
      (1L, "http://a.com/1",
        "<body><a href=\"/p1\">x</a> <a href=\"/seen\">s</a></body>"),
      (2L, "http://b.com/2",
        "<body><a href=\"/p1\">y</a> <a href=\"http://a.com/p1\">z</a></body>"))
      .toDF("doc", "page_url", "html")
    val lnk = HtmlOps.extractLinks(pages, "html", "page_url")
    val crawled = Seq("http://a.com/seen", "http://c.com/other").toDF("url")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = key(HtmlOps.frontierFilter(lnk, crawled, "url"))
    graft.CacheRegistry.releaseAll()
    // /p1 referenced by both hosts' pages → two distinct urls, one with
    // n_refs 2; the crawled url is excluded
    assert(exact.contains(("http://a.com/p1", "a.com", 2L)))
    assert(!exact.exists(_._1 == "http://a.com/seen"))
    // fpp 0.5 forces false positives through the exact verify path
    for (fpp <- Seq(0.5, 0.01)) {
      val viaBloom = key(HtmlOps.frontierFilterBloom(lnk, crawled, "url", fpp))
      graft.CacheRegistry.releaseAll()
      assert(viaBloom == exact, s"bloom/exact divergence at fpp $fpp")
    }
    // empty seen-set short-circuits to the bare rollup
    val open = key(HtmlOps.frontierFilterBloom(lnk,
      crawled.filter(col("url") === "nope"), "url"))
    graft.CacheRegistry.releaseAll()
    assert(open == exact + (("http://a.com/seen", "a.com", 1L)))
    // sliver-broadcast size gate at 0: the verify join must drop the
    // broadcast hint (a mature crawl's sliver is most of the batch — a
    // forced broadcast there is an OOM) and stay bit-identical
    val gated = key(HtmlOps.frontierFilterBloom(lnk, crawled, "url",
      fpp = 0.5, maxBroadcastSliver = 0L))
    graft.CacheRegistry.releaseAll()
    assert(gated == exact, "gated (non-broadcast) sliver path diverged")
  }

  test("title entity-decoded and normalized; absent title is empty") {
    val r = extract(
      "<html><head><title>  A &amp;  B </title></head><body><p>t</p></body></html>")
    assert(r.getString(0) == "A & B")
    assert(extract("<body><p>t</p></body>").getString(0) == "")
  }
}
