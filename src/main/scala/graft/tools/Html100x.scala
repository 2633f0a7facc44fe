package graft.tools

import graft.operators.HtmlOps
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the HTML extraction tier
  * ([[HtmlOps.htmlExtract]]/[[HtmlOps.extractLinks]]) — the r13 verdict's
  * missing standing: the text/dedup/graph/ANN families all carry
  * 100×-scale attestations, the extraction tier stopped at 10×.
  *
  * Corpus: `nPages` (default 500k) synthetic pages in four page SHAPES
  * (id % 4), each with a CLOSED-FORM expected extraction the tool states
  * as Spark columns and compares exactly — zero mismatches required:
  *  - shape 0, well-formed: head with style/script traps, nav +
  *    link-only boilerplate (density-dropped), a heading and a body
  *    paragraph (kept) — title/text/counts all stated from `id`;
  *  - shape 1, unclosed `<script`: browser semantics — everything from
  *    the opener to end of page swallowed, the paragraph before it
  *    survives;
  *  - shape 2, entity flood: hundreds of named/decimal/hex references
  *    per page, decoded one-pass;
  *  - shape 3, single-block unclosed-anchor farm: NO block tags and
  *    hundreds of `<a` openers that never close — the adversarial shape
  *    whose whole-block lazy scans were measured quadratic; the one
  *    closed anchor must keep the block under the density rule.
  * Outlink extraction is asserted on shape 0 (3 resolved links per page,
  * document order, path-absolute resolution).
  *
  * Also MEASURES the linearity claim the r14 hardening makes for the
  * anchor-density scan: per-page wall clock of the linear split-at-opener
  * extraction vs the OLD whole-block `regexp_extract_all("<a…>.*?</a>")`
  * form on single-block unclosed-anchor pages at 200/400/800/1600 KB —
  * the quadratic shape doubles its per-KB cost with every doubling, the
  * shipped scan stays flat (the SCALE.md table).
  *
  * Usage: runMain graft.tools.Html100x [nPages]
  */
object Html100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val id = col("id")
    val entityReps = 50
    val farmReps = 100
    def rep(s: String, k: Int) = lit(s * k)
    val html = when(id % 4 === 0, concat(
        lit("<html><head><title> T"), id.cast("string"), lit(" </title>"),
        lit("<style>.m{color:red}</style>"),
        lit("<script>var s=\"</p><div>trap</div>\";</script></head><body>"),
        lit("<nav><a href=\"/a\">A</a> <a href=\"/b\">B</a></nav>"),
        lit("<h1>H"), (id % 10).cast("string"), lit("</h1><p>body text "), id.cast("string"),
        lit(" words here</p><p><a href=\"/x\">link only</a></p></body></html>")))
      .when(id % 4 === 1, concat(
        lit("<body><p>pre "), id.cast("string"), lit("</p><script>var x=1;<p>after</p>")))
      .when(id % 4 === 2, concat(
        lit("<body><p>"), rep("&amp;&#8217;&#x41; ", entityReps),
        lit("tail "), id.cast("string"), lit("</p></body>")))
      .otherwise(concat(
        lit("<body>text "), id.cast("string"), rep(" <a href=\"/x\">w", farmReps),
        lit(" <a href=\"/y\">t</a></body>")))
    val pages = spark.range(n).select(id.as("doc"),
      concat(lit("http://h"), (id % 97).cast("string"), lit(".com/d/"), id.cast("string")).as("page_url"),
      html.as("html"))

    // ---- bulk extraction against the closed form ----
    val t0 = System.nanoTime()
    val got = graft.CacheRegistry.persistTracked(
      HtmlOps.htmlExtract(pages.drop("page_url"), "html"))
    val nGot = got.count()
    val bulkSec = (System.nanoTime() - t0) / 1e9
    val expText = when(col("doc") % 4 === 0,
        concat(lit("H"), (col("doc") % 10).cast("string"), lit("\nbody text "), col("doc").cast("string"),
          lit(" words here")))
      .when(col("doc") % 4 === 1, concat(lit("pre "), col("doc").cast("string")))
      .when(col("doc") % 4 === 2,
        concat(lit("&’A " * entityReps), lit("tail "), col("doc").cast("string")))
      .otherwise(concat(lit("text "), col("doc").cast("string"), lit(" w" * farmReps),
        lit(" t")))
    val expTitle = when(col("doc") % 4 === 0,
      concat(lit("T"), col("doc").cast("string"))).otherwise(lit(""))
    val expBlocks = when(col("doc") % 4 === 0, 2L).otherwise(1L)
    val expDropped = when(col("doc") % 4 === 0, 2L).otherwise(0L)
    val mismatches = got.filter(
      col("text") =!= expText || col("title") =!= expTitle ||
        col("n_blocks") =!= expBlocks || col("n_dropped") =!= expDropped)
      .count()
    graft.CacheRegistry.releaseAll()

    // ---- outlinks on the well-formed shape: 3 resolved links/page ----
    val links = graft.CacheRegistry.persistTracked(
      HtmlOps.extractLinks(pages.filter(id % 4 === 0), "html", "page_url"))
    val linkRows = links.count()
    val expLinkRows = ((n + 3) / 4) * 3
    val badLinks = links.filter(col("url").isNull ||
        col("url") =!= concat(lit("http://h"), (col("doc") % 97).cast("string"), lit(".com"),
          element_at(array(lit("/a"), lit("/b"), lit("/x")),
            (col("link_idx") + 1).cast("int"))))
      .count()
    graft.CacheRegistry.releaseAll()

    // ---- linearity: shipped scan vs the old whole-block anchor scan ----
    import spark.implicits._
    // NO closing </a> anywhere: with one, the first lazy match swallows
    // the page in one pass and the old scan looks linear; with none,
    // every opener restarts a failing scan to end-of-page — the true
    // O(openers × size) shape crawled corpora contain
    def adversarial(kb: Int): String = {
      val opener = "<a href=\"/x\">w "
      val sb = new StringBuilder("<body>real text here ")
      while (sb.length < kb * 1024) sb.append(opener)
      sb.toString
    }
    def timeNew(page: String): Double = {
      val df = Seq((1L, page)).toDF("doc", "html")
      val t = System.nanoTime()
      HtmlOps.htmlExtract(df, "html").select(length(col("text"))).head()
      (System.nanoTime() - t) / 1e9
    }
    def timeOld(page: String): Double = {
      // the pre-r14 per-block anchor tally in isolation: one lazy
      // whole-string extract_all — O(openers × size) on this shape
      val df = Seq(page).toDF("h")
      val t = System.nanoTime()
      df.select(length(array_join(regexp_extract_all(col("h"),
        lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1)), " "))).head()
      (System.nanoTime() - t) / 1e9
    }
    val sizes = Seq(200, 400, 800, 1600)
    locally { val p = adversarial(100); timeNew(p); timeOld(p) } // JIT warm
    // the old scan is only measured to 400 KB: at 100k openers it is
    // already O(minutes) per page — the point of the table
    val curve = sizes.map { kb =>
      val p = adversarial(kb)
      (kb, timeNew(p), if (kb <= 400) Some(timeOld(p)) else None)
    }
    val curveJson = curve.map { case (kb, nw, od) =>
      f"""{"kb":$kb,"linear_sec":$nw%.3f""" +
        od.map(o => f""","old_quadratic_sec":$o%.3f}""").getOrElse("}")
    }.mkString("[", ",", "]")

    println(s"""{"tool":"html_100x","n_pages":$n,"extracted":$nGot,""" +
      s""""mismatches":$mismatches,"bulk_sec":$bulkSec,""" +
      s""""pages_per_sec":${(n / bulkSec).toLong},""" +
      s""""link_rows":$linkRows,"expected_link_rows":$expLinkRows,""" +
      s""""bad_links":$badLinks,"adversarial_curve":$curveJson}""")
    require(mismatches == 0 && linkRows == expLinkRows && badLinks == 0,
      s"planted-oracle mismatch: $mismatches bad pages, $badLinks bad links")
    println("[html_100x] PLANTED ORACLE GREEN (extraction + outlinks)")
    spark.stop()
  }
}
