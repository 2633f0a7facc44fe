package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming crawl-frontier admission — the continuous twin of
  * [[graft.operators.HtmlOps.frontierFilter]]: pages arrive as a stream,
  * outlinks are extracted per row (the whole
  * [[graft.operators.HtmlOps.extractLinks]] lineage is stateless
  * projections + one generate, so it runs on a `readStream` unchanged),
  * URLs already fetched are dropped by a STREAM-STATIC left-anti join
  * against the crawled-set table, and each surviving URL is emitted
  * EXACTLY ONCE — the first time any page references it — through a
  * first-seen state keyed on the url.
  *
  * This is the shape a live crawler runs: parse workers feed pages in,
  * the scheduler receives a stream of newly-discovered fetchable URLs.
  * Parity with batch (spec + drained oracle row): the emitted set over
  * any drained prefix equals the batch [[graft.operators.HtmlOps
  * .frontierFilter]] url/host set over the same pages (the batch form
  * additionally carries `n_refs`, which is not final until the corpus
  * is — a stream emits admissions, not totals). Re-deliveries of an
  * already-admitted url emit nothing (the state absorbs at-least-once
  * sources).
  *
  * Scale: state is one boolean per DISTINCT admitted url — the honest
  * cost of exact first-seen semantics; a 100 TB deployment bounds it
  * the same way the batch side bounds its seen-set shuffle, by fronting
  * the state with the broadcast-Bloom prefilter
  * ([[graft.operators.TextOps.decontaminateBloom]]'s discipline) so
  * only probable-new urls reach the stateful operator. Each micro-batch
  * shuffles once on `url` (the anti-join and the state operator share
  * the key).
  */
object FrontierStream {

  case class LinkRow(url: String, dstHost: String)
  case class Admitted(url: String, dst_host: String)

  /** pages(stream) → admitted frontier urls (append-mode). `crawled`
    * must be a STATIC frame (the fetched-set snapshot this run admits
    * against). */
  def admittedStream(pages: DataFrame, htmlCol: String, baseUrlCol: String,
                     crawled: DataFrame, crawledUrlCol: String): Dataset[Admitted] = {
    import pages.sparkSession.implicits._
    val links = graft.operators.HtmlOps.extractLinks(pages, htmlCol, baseUrlCol)
    val cand = links.filter(col("url").isNotNull)
      .join(crawled.select(col(crawledUrlCol).as("url")), Seq("url"),
        "left_anti")
      .select(col("url"), col("dst_host").as("dstHost")).as[LinkRow]
    cand.groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (url: String, rows: Iterator[LinkRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(Admitted(url, rows.next().dstHost))
          })
  }
}
