package graft.tools

import graft.operators.HtmlOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the crawl-frontier admission tier
  * ([[HtmlOps.frontierFilter]] / [[HtmlOps.frontierFilterBloom]]) — the
  * r14 verdict's missing standing: every other 100 TB-axis family
  * (pairs, CC, CDC, containment, incremental dedup, ANN append, HTML)
  * carries a 100×-scale attestation; the admission tier stopped at 10×.
  *
  * World (closed form): `nUrls` distinct candidate URLs
  * (`http://h{i%997}.com/p{i}`), each referenced EXACTLY twice (the
  * rollup's n_refs is pinned, not incidental), against a crawled set of
  * every i % 5 = 0 url — so the survivor set is exactly the i % 5 ≠ 0
  * urls, `4/5 · nUrls` rows, every one with n_refs = 2 and its host
  * derivable from i. Both plans are checked row-exactly against that
  * closed form (zero bad rows, zero crawled leaks, exact count) — and
  * against each other by construction, the shared-oracle discipline of
  * the `web_frontier`/`web_frontier_bloom` pair at 500× the gated row
  * count.
  *
  * Also MEASURES the admission economics the Bloom front exists for:
  * wall-clock and total SHUFFLE-WRITE BYTES of the exact anti-join plan
  * (candidates AND the crawled set both exchange on url) vs the
  * Bloom-fronted plan (only the candidate rollup exchanges; the crawled
  * set is scanned for the sketch + the sliver verify, never shuffled).
  * Scans parallelize for free at 1000 executors; exchanges do not — the
  * shuffle-byte delta is the headline number (docs/SCALE.md).
  *
  * Usage: runMain graft.tools.Frontier100x [nUrls]
  */
object Frontier100x {
  def main(args: Array[String]): Unit = {
    val nUrls = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-level shuffle-write accounting (listener bus is async: each
    // measurement sleeps it out before reading — a standing tool, not a
    // profiler)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    def urlOf(i: org.apache.spark.sql.Column) =
      concat(lit("http://h"), (i % 997).cast("string"), lit(".com/p"),
        i.cast("string"))
    // two references per url: rows 2i and 2i+1 both point at url i
    // (DIV, not `/`: long division — `/` widens to double and the url
    // would render "p2500000.5")
    val links = spark.range(2L * nUrls).select(
      urlOf(expr("id DIV 2")).as("url"),
      concat(lit("h"), (expr("id DIV 2") % 997).cast("string"),
        lit(".com")).as("dst_host"))
    // the crawled set is a TABLE ON DISK, as in any real crawler — also
    // load-bearing for the measurement: a range-backed frame carries an
    // 8-bytes/row size estimate, so the exact plan would broadcast the
    // seen set and dodge the very exchange the Bloom front exists to
    // remove; parquet-backed stats put it over the broadcast threshold,
    // which is the 100 TB regime (a seen set never fits a broadcast
    // there). It holds the 1M true duplicates (every i % 5 = 0
    // candidate) PLUS 3·nUrls historical urls no page references —
    // a mature crawl's accumulated state dwarfs each discovery batch,
    // and THAT asymmetry is what the Bloom plan monetizes: measured in
    // the inverted regime (crawled ⊂ candidates) the sliver-verify
    // machinery actually shuffles MORE than the exact plan saves.
    val crawledDir = java.nio.file.Files
      .createTempDirectory("frontier100x_crawled").toString + "/t"
    spark.range(nUrls / 5).select(urlOf(col("id") * 5).as("url"))
      .unionAll(spark.range(3L * nUrls).select(
        concat(lit("http://h"), (col("id") % 997).cast("string"),
          lit(".com/old"), col("id").cast("string")).as("url")))
      .write.mode("overwrite").parquet(crawledDir)
    val crawled = spark.read.parquet(crawledDir)

    val expSurvivors = nUrls - nUrls / 5
    def check(admitted: DataFrame): (Long, Long, Double, Long) = {
      Thread.sleep(2000); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val got = graft.CacheRegistry.persistTracked(admitted)
      val nGot = got.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val i = regexp_extract(col("url"), "/p([0-9]+)$", 1).cast("long")
      val bad = got.filter(i % 5 === 0 || col("n_refs") =!= 2L ||
          col("dst_host") =!= concat(lit("h"), (i % 997).cast("string"),
            lit(".com")))
        .count()
      graft.CacheRegistry.releaseAll()
      Thread.sleep(3000) // drain the listener bus before reading the gauge
      (nGot, bad, sec, shuffleBytes.get())
    }

    val (nExact, badExact, secExact, shufExact) =
      check(HtmlOps.frontierFilter(links, crawled, "url"))
    val (nBloom, badBloom, secBloom, shufBloom) =
      check(HtmlOps.frontierFilterBloom(links, crawled, "url"))

    println(s"""{"tool":"frontier_100x","n_urls":$nUrls,""" +
      s""""n_crawled":${nUrls / 5 + 3L * nUrls},""" +
      s""""expected_survivors":$expSurvivors,""" +
      s""""exact":{"rows":$nExact,"bad":$badExact,""" +
      f""""sec":$secExact%.2f,"shuffle_mb":${shufExact / 1e6}%.1f},""" +
      s""""bloom":{"rows":$nBloom,"bad":$badBloom,""" +
      f""""sec":$secBloom%.2f,"shuffle_mb":${shufBloom / 1e6}%.1f},""" +
      f""""shuffle_saving":${1.0 - shufBloom.toDouble / math.max(shufExact, 1L)}%.3f}""")
    require(nExact == expSurvivors && nBloom == expSurvivors &&
      badExact == 0 && badBloom == 0,
      s"planted-oracle mismatch: exact $nExact/$badExact bad, " +
        s"bloom $nBloom/$badBloom bad (expected $expSurvivors)")
    println("[frontier_100x] PLANTED ORACLE GREEN (exact + bloom plans)")
    spark.stop()
  }
}
