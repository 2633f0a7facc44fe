package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage attribution for the HTML extraction chains — times
  * cumulative prefixes of the extractLinks pipeline over the planted
  * link-farm fixture, so the kernel-vs-HOF decision is a measured number.
  * Run: `runMain graft.tools.HtmlProbe [sfDir]`. */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val id = col("doc_id").cast("long")
    def pages = graft.Tables.documents(spark, dir).select(
      id.as("doc"),
      concat(lit("http://ex"), (id % 7).cast("string"), lit(".com/"),
        id.cast("string")).as("page_url"),
      concat(lit("<html><head><title>Doc "), id,
        lit("</title><script>var x = '<a href=\"/ghost\">';</script>"),
        lit("<style>a { color: red } /* <a href=\"/ghost2\"> */</style>"),
        lit("</head><body><nav><a href=\"/\">home</a> <a href=\"/about\">about</a> <a href=\"/contact\">contact</a></nav>"),
        lit("<p>"), col("text"), lit(" <a href=\"http://ex"),
        ((id + 1) % 7).cast("string"), lit(".com/"), ((id + 1)).cast("string"),
        lit("\">next</a> <a href='//ex"), ((id + 2) % 7).cast("string"),
        lit(".com/p'>proto</a> <a href=\"../up/./x\">rel</a>"),
        lit(" <a href=\"mailto:a@b.c\">mail</a> <a href=\"#frag\">frag</a></p>"),
        lit("<footer><a href=\"/terms\">terms</a></footer></body></html>"))
        .as("html"))

    def time(name: String, df: => DataFrame): Unit = {
      // warm once, then best of 3
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hprobe] $name%-28s ${ts.min}%7.3f s")
    }

    time("synthesize_only", pages)
    // reflectively reach the private stages via public surface: rebuild
    // the chain inline (same exprs as HtmlOps.extractLinks)
    def stripSpansLinear(c: org.apache.spark.sql.Column, lookahead: String,
                         opener: String, elem: String) =
      array_join(transform(split(c, lookahead), s =>
        when(!s.rlike(opener), s)
          .when(s.rlike(elem), regexp_replace(s, elem, " "))
          .otherwise(lit(" "))), "")
    def stripNonContent(html: org.apache.spark.sql.Column) = {
      val noScript = stripSpansLinear(html, "(?i)(?=<script\\b)",
        "(?i)^<script\\b", "(?is)^<script\\b[^>]*>.*?</script\\s*>")
      val noStyle = stripSpansLinear(noScript, "(?i)(?=<style\\b)",
        "(?i)^<style\\b", "(?is)^<style\\b[^>]*>.*?</style\\s*>")
      stripSpansLinear(noStyle, "(?=<!--)", "^<!--", "(?s)^<!--.*?-->")
    }
    time("strip_noncontent", pages.select(col("doc"),
      length(stripNonContent(col("html"))).as("n")))
    val segd = pages.select(col("doc"), col("page_url"),
      split(stripNonContent(col("html")), "(?i)(?=<a\\b)").as("_segs"))
    time("strip+seg", segd.select(col("doc"), size(col("_segs")).as("n")))
    val elems = segd.select(col("doc"), col("page_url"),
      filter(transform(col("_segs"), s => struct(
          regexp_extract(s,
            "(?is)^<a\\b[^>]*?(?<![\\w-])href\\s*=\\s*\"([^\"]*)\"", 1).as("dq"),
          regexp_extract(s,
            "(?is)^<a\\b[^>]*?(?<![\\w-])href\\s*=\\s*'([^']*)'", 1).as("sq"),
          regexp_extract(s, "(?is)^(<a\\b[^>]*>.*?</a\\s*>)", 1)
            .as("elem"))),
        x => x("elem") =!= "").as("_elems"))
    time("strip+seg+elems", elems.select(col("doc"),
      size(col("_elems")).as("n")))
    time("full_extractLinks", graft.operators.HtmlOps.extractLinks(
      pages, "html", "page_url"))
    time("full_htmlExtract", graft.operators.HtmlOps.htmlExtract(
      pages, "html"))
    spark.stop()
  }
}
