package graft.streaming

import graft.SparkSpec
import graft.operators.HtmlOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Frontier-at-ingest contract ([[FrontierStream.admittedStream]]):
  * admitted set equals the batch [[HtmlOps.frontierFilter]] url/host set
  * for any micro-batch split; crawled urls never pass; re-deliveries and
  * repeat references emit nothing. */
class FrontierStreamSpec extends SparkSpec {
  import spark.implicits._

  // pages: doc 1 and 3 both link /p1 (repeat reference across batches);
  // /seen is in the crawled set; doc 2 adds a cross-host absolute
  val pages: Seq[(Long, String, String)] = Seq(
    (1L, "http://a.com/1",
      """<body><a href="/p1">x</a> <a href="/seen">s</a></body>"""),
    (2L, "http://a.com/2",
      """<body><a href="http://b.com/z">z</a> <a href="#f">f</a></body>"""),
    (3L, "http://a.com/sub/3",
      """<body><a href="/p1">x again</a> <a href="q2/">rel dir</a></body>"""))

  def crawled = Seq("http://a.com/seen").toDF("url")

  def runStream(batches: Seq[Seq[(Long, String, String)]]): Set[(String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val name = s"frontier_${System.nanoTime()}"
    val q = FrontierStream.admittedStream(
        input.toDF().toDF("doc", "page_url", "html"), "html", "page_url",
        crawled, "url")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  def batchSet(rows: Seq[(Long, String, String)]): Set[(String, String)] =
    HtmlOps.frontierFilter(
        HtmlOps.extractLinks(rows.toDF("doc", "page_url", "html"),
          "html", "page_url"),
        crawled, "url")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("admitted set == batch frontier for any micro-batch split") {
    val expected = batchSet(pages)
    // the crawled url is excluded, the repeat-referenced /p1 is one row,
    // the relative-dir url resolved against the page's directory
    assert(expected == Set(
      ("http://a.com/p1", "a.com"),
      ("http://b.com/z", "b.com"),
      ("http://a.com/sub/q2/", "a.com")))
    assert(runStream(pages.map(Seq(_))) == expected)
    assert(runStream(Seq(pages)) == expected)
    assert(runStream(Seq(pages.take(1), pages.drop(1))) == expected)
  }

  test("at-least-once: a re-delivered page admits nothing new") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val name = s"frontier_redeliver_${System.nanoTime()}"
    val q = FrontierStream.admittedStream(
        input.toDF().toDF("doc", "page_url", "html"), "html", "page_url",
        crawled, "url")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData(pages); q.processAllAvailable()
    val afterFirst = spark.table(name).count()
    input.addData(pages); q.processAllAvailable() // full re-delivery
    val afterSecond = spark.table(name).count()
    q.stop()
    assert(afterFirst == 3L && afterSecond == afterFirst)
  }
}
