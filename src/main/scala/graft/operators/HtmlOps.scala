package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the WARC-to-training-text stage of a web
  * corpus pipeline (the Common Crawl WET path: archive → response
  * payload → visible text, boilerplate removed).
  *
  * The reference ingests already-clean text; a 100 TB web corpus does
  * not arrive clean — the dominant preprocessing cost is turning crawled
  * HTML into paragraphs worth training on. This stage is deliberately
  * HTML-lite (the [[RobotsOps.sitemapUrls]] stance, applied to pages):
  * regex/HOF row-local column logic — no DOM library, no UDF, no state —
  * so it runs inside the scan projection at any corpus size, and a
  * malformed page degrades to fewer blocks rather than a thrown task.
  *
  * Extraction contract, in order:
  *  1. `<script>…</script>` and `<style>…</style>` elements are removed
  *     FIRST (lazy, case-insensitive, dot-all, close tag matched to the
  *     open tag by backreference) — markup inside script strings must
  *     never shred the block structure;
  *  2. `<!-- comments -->` are removed (a commented-out `<p>` is not
  *     content);
  *  3. the `<title>` text is captured, entity-decoded and
  *     whitespace-normalized, as the page title;
  *  4. content is the `<body>` element when present (prologue/head cut;
  *     a body-less fragment is treated as all content);
  *  5. the body splits into BLOCKS at block-level tag boundaries
  *     (`p div h1-h6 li ul ol br hr nav footer header section article
  *     aside main table thead tbody tr td th blockquote pre form`,
  *     open or close); inline tags (`a b i em span strong code …`) stay
  *     inside their block;
  *  6. per block: tags stripped, THEN entities decoded (a decoded
  *     `&lt;script&gt;` is text, never re-parsed markup), THEN
  *     whitespace collapsed (`\s+` → one space) and trimmed. The decoded
  *     entity set is the named core + the numeric quote forms
  *     (`&amp; &lt; &gt; &quot; &apos; &nbsp; &#39; &#34;`); other
  *     numeric references pass through verbatim — same XML-lite
  *     degradation rule as the sitemap parser;
  *  7. BOILERPLATE RULE: a block whose anchor-text length exceeds
  *     `maxLinkDensity` × its total text length is dropped (nav bars,
  *     footers, link farms — the readability/jusText line-density
  *     heuristic, at block granularity). Anchor text is the
  *     concatenation of `<a>…</a>` inner texts (tag-stripped, decoded,
  *     normalized, single-space-joined). Empty blocks are neither kept
  *     nor counted as dropped.
  *
  * Output: the input frame minus the html column, plus `title`,
  * `text` (kept blocks joined with `\n`), `n_blocks` (kept) and
  * `n_dropped` (non-empty boilerplate blocks removed) — the two counts
  * make the boilerplate rate auditable corpus-wide.
  *
  * Scale shape: fully row-local (regexp chains + one HOF pass over the
  * block array; each intermediate array is materialized in its own
  * Project so Catalyst reads attributes instead of re-evaluating the
  * chain inside every lambda — the [[TextOps.shingled]] CSE discipline).
  * No shuffle, no join, no window: at 100 TB this pipelines inside the
  * WARC scan with zero exchanges.
  */
object HtmlOps {

  /** Block-boundary tags: open or close, any attributes, optional
    * self-close. `title|head|html|body` are included so head remnants
    * never fuse with the first content block on body-less fragments. */
  private val BlockTagRx =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|hr|nav|footer|header|section" +
      "|article|aside|main|table|thead|tbody|tr|td|th|blockquote|pre" +
      "|form|title|head|body|html)\\b[^>]*>"

  /** Named core + numeric quote forms; `&amp;` decodes LAST so
    * double-escaped text (`&amp;lt;`) yields the literal `&lt;` it
    * denotes, never a re-decoded `<`. */
  def decodeEntities(c: Column): Column = {
    val named = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&#39;" -> "'", "&#34;" -> "\"")
    val partial = named.foldLeft(c) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }
    replace(partial, lit("&amp;"), lit("&"))
  }

  /** Collapse runs of whitespace to one space and trim. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** strip tags → decode entities → normalize: the per-block clean. */
  private def cleanFragment(c: Column): Column =
    normalizeWs(decodeEntities(regexp_replace(c, "<[^>]*>", " ")))

  /** script/style elements, then comments, removed (contract steps 1-2). */
  private def stripNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(html,
        "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " "),
      "(?s)<!--.*?-->", " ")

  /** The `<body>` slice (whole document when no body tag). */
  private def bodyOf(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "(?is)^.*?<body\\b[^>]*>", " "),
      "(?is)</body\\s*>.*$", " ")

  /** Append `title`, `text`, `n_blocks`, `n_dropped` (html column
    * dropped). See the object contract. */
  def htmlExtract(pages: DataFrame, htmlCol: String,
                  maxLinkDensity: Double = 0.5): DataFrame = {
    val keep = pages.columns.filterNot(_ == htmlCol).map(col).toSeq
    val stripped = pages.select(
      keep :+ stripNonContent(col(htmlCol)).as("_h"): _*)
    // each stage in its own Project: HOF lambdas must read attributes,
    // not re-run the regex chain per element (no CSE across HOFs)
    val segged = stripped.select(
      keep :+
        regexp_extract(col("_h"), "(?is)<title[^>]*>(.*?)</title", 1)
          .as("_rawTitle") :+
        split(bodyOf(col("_h")), BlockTagRx).as("_segs"): _*)
    val cleaned = segged.select(
      keep :+ col("_rawTitle") :+
        transform(col("_segs"), s => struct(
          cleanFragment(s).as("t"),
          cleanFragment(
            array_join(regexp_extract_all(s,
              lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1)), " ")).as("a")))
          .as("_blocks"): _*)
    val judged = cleaned.select(
      keep :+ col("_rawTitle") :+
        filter(col("_blocks"), b => length(b("t")) > 0).as("_ne"): _*)
    val kept = judged.select(
      keep :+ col("_rawTitle") :+ col("_ne") :+
        filter(col("_ne"),
          b => length(b("a")).cast("double") <=
            lit(maxLinkDensity) * length(b("t")).cast("double"))
          .as("_kept"): _*)
    kept.select(
      keep :+
        normalizeWs(decodeEntities(col("_rawTitle"))).as("title") :+
        array_join(transform(col("_kept"), b => b("t")), "\n").as("text") :+
        size(col("_kept")).cast("long").as("n_blocks") :+
        (size(col("_ne")) - size(col("_kept"))).cast("long")
          .as("n_dropped"): _*)
  }
}
