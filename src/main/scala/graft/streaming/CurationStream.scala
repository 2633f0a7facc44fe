package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{SampleOps, TextOps}

/** Ingest-time corpus curation — the streaming twin of the composed batch
  * `curation_pipeline` (dedup → decontaminate → PII scrub → quality gate →
  * deterministic stratified sample; the reference's batch-DAG shape,
  * pipelines.py:557-819, re-aimed at a training-data ingest).
  *
  * Everything after the dedup is ROW-LOCAL (regex scrub, quality
  * heuristics, language id, salted-threshold sampling — the stateless tier
  * proven stream≡batch in TextStreamSpec), expressed on ONE lineage via
  * the shared Column forms ([[TextOps.qualityCol]], [[TextOps.langPredCol]],
  * [[TextOps.estTokensCol]]) so no stream-stream join-back is needed. The
  * only state the stream carries is the exact-dedup seen-set:
  *
  *  - **dedup-at-ingest**: `flatMapGroupsWithState` keyed by the text's
  *    md5 — the first-arriving document of each distinct text passes,
  *    later copies drop. State per key is one boolean (the key itself is
  *    the fingerprint). The batch twin's window-over-md5 keeps the
  *    minimum doc id, which equals first-arrival whenever ingest is
  *    id-ordered (append-ordered ingest; the parity spec's feed).
  *  - **decontamination**: the benchmark shingle-hash set is tiny by
  *    construction (eval suites are KBs-MBs against a 100 TB stream), so
  *    it rides into the plan as a LITERAL array and the overlap count is
  *    `size(array_intersect(hv, bench))` per row — the same
  *    distinct-shingle-overlap rule as [[TextOps.decontaminate]] (whose
  *    broadcast hash-join form the batch pipeline uses) with zero
  *    stream-side shuffle and no watermark requirement.
  *
  * Output matches the batch pipeline row shape: (doc, lang_pred, quality,
  * est_tokens, scrub_hash).
  */
object CurationStream {

  /** Exact dedup at ingest: key = md5(text); the first document of each
    * key passes, duplicates drop. Same-batch ties resolve to the smallest
    * doc id (arrival-order-free within a micro-batch, and equal to the
    * batch window rule under id-ordered ingest). Works identically on a
    * batch DataFrame (flatMapGroupsWithState degrades to a group-scan). */
  def dedupExactStream(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val outSchema = docs.schema
    val key = freshKeyName(docs)
    val keyed = docs.withColumn(key, md5(col(textCol).cast("binary")))
    val kIdx = keyed.schema.fieldIndex(key)
    val idIdx = keyed.schema.fieldIndex(idCol)
    // project the output by the ORIGINAL schema's field positions, not a
    // positional tail-drop — robust to any future internal-column layout
    val outIdx = outSchema.fieldNames.map(keyed.schema.fieldIndex)
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    implicit val boolEnc: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    keyed.groupByKey(_.getString(kIdx))(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[Row], state: GroupState[Boolean]) => {
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            val first = it.minBy(_.getLong(idIdx))
            Iterator(Row.fromSeq(outIdx.toSeq.map(first.get)))
          }
        })
  }

  /** A collision-safe internal key-column name: `__graft_dedup_key`,
    * suffixed until it is fresh in `docs` — a caller column of the same
    * name can never be replaced-in-place and then stripped (the r7
    * advisory's silent-corruption path). */
  private def freshKeyName(docs: DataFrame): String = {
    var k = "__graft_dedup_key"
    while (docs.columns.contains(k)) k += "_"
    k
  }

  /** TTL-bounded exact dedup for an UNBOUNDED ingest — the production
    * form of [[dedupExactStream]], whose seen-set otherwise grows one
    * entry per distinct document forever (the r5/r6 verdicts' named
    * leak). Same first-wins rule, but each fingerprint's state expires
    * once the EVENT-TIME watermark (on `tsCol`, lateness
    * `watermarkDelay`) passes its last sighting + `ttlMs` — every
    * sighting of a text, duplicate or not, extends its horizon.
    *
    * RECALL SEMANTICS (documented tradeoff, not a bug): a duplicate
    * arriving within `ttlMs` of its text's last sighting is dropped
    * exactly like the unbounded form; a duplicate arriving later is
    * RE-ADMITTED — its seen-state was evicted, so it is
    * indistinguishable from a first sighting. Exact-dedup recall is
    * therefore scoped to the TTL window (the CCNet/web-crawl setting:
    * re-crawls cluster in time, so a TTL of one crawl cycle catches
    * nearly all of them while state stays O(distinct texts per window)
    * instead of O(all texts ever)). The unbounded form remains the
    * batch-parity baseline and the right choice for bounded backfills. */
  def dedupExactStreamTtl(docs: DataFrame, idCol: String, textCol: String,
                          tsCol: String, ttlMs: Long,
                          watermarkDelay: String = "0 seconds"): DataFrame = {
    val outSchema = docs.schema
    val key = freshKeyName(docs)
    // a null event time has no place on the TTL horizon (and would NPE the
    // state-timeout math); watermark semantics drop such rows anyway, so
    // the explicit filter just makes the contract visible in the plan
    val keyed = docs.filter(col(tsCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .withColumn(key, md5(col(textCol).cast("binary")))
    val kIdx = keyed.schema.fieldIndex(key)
    val idIdx = keyed.schema.fieldIndex(idCol)
    val tsIdx = keyed.schema.fieldIndex(tsCol)
    val outIdx = outSchema.fieldNames.map(keyed.schema.fieldIndex)
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    implicit val boolEnc: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    keyed.groupByKey(_.getString(kIdx))(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: String, it: Iterator[Row], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toSeq
            val maxTs = rows.map(_.getTimestamp(tsIdx).getTime).max
            val out =
              if (state.getOption.contains(true)) Iterator.empty
              else {
                state.update(true)
                val first = rows.minBy(_.getLong(idIdx))
                Iterator(Row.fromSeq(outIdx.toSeq.map(first.get)))
              }
            // every sighting refreshes the eviction horizon; rows passed
            // the watermark filter, so maxTs + ttl is always ahead of it
            state.setTimeoutTimestamp(maxTs + ttlMs)
            out
          }
        })
  }

  /** The row-local contamination test: ≥ `minOverlap` distinct shingle
    * hashes shared with the benchmark set (the literal-array form of
    * [[TextOps.decontaminate]]'s broadcast join). */
  def contaminated(textCol: Column, benchHashes: Seq[Long],
                   k: Int = 3, minOverlap: Int = 1): Column =
    size(array_intersect(
      graft.functions.TextHash.shingle_hash60(textCol, k, TextOps.HashMod),
      typedLit(benchHashes))) >= minOverlap

  /** Distinct shingle-hash set of a (small) benchmark table — collected
    * once at plan-build time. */
  def benchShingleHashes(bench: DataFrame, textCol: String,
                         k: Int = 3): Seq[Long] =
    bench.select(explode(graft.functions.TextHash.shingle_hash60(
        col(textCol), k, TextOps.HashMod)).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq

  /** The full ingest-time curation chain. `docs` may be streaming or
    * batch — the lineage is identical. `dedupTtl = Some((tsCol, ttlMs))`
    * swaps the unbounded seen-set for the TTL-bounded
    * [[dedupExactStreamTtl]] (the unbounded default is the batch-parity
    * baseline; any long-running ingest should pass a TTL). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             benchHashes: Seq[Long], minOverlap: Int = 5,
             minQuality: Double = 0.6,
             rates: Map[String, Double] = Map.empty,
             defaultRate: Double = 1.0, salt: String = "graft",
             dedupTtl: Option[(String, Long)] = None): DataFrame = {
    val deduped = dedupTtl match {
      case Some((tsCol, ttlMs)) =>
        dedupExactStreamTtl(docs, idCol, textCol, tsCol, ttlMs)
      case None => dedupExactStream(docs, idCol, textCol)
    }
    val uniq = deduped
      .filter(!contaminated(col(textCol), benchHashes, minOverlap = minOverlap))
    val scrubbed = TextOps.piiScrub(uniq, idCol, textCol)
      .select(col("doc"), col("scrubbed"))
    val enriched = scrubbed
      .withColumn("quality", TextOps.qualityCol(col("scrubbed")))
      .withColumn("est_tokens", TextOps.estTokensCol(col("scrubbed")))
      .withColumn("lang_pred", TextOps.langPredCol(col("scrubbed")))
      .filter(col("quality") >= minQuality)
    SampleOps.stratified(enriched, "doc", "lang_pred", rates, defaultRate, salt)
      .select(col("doc"), col("lang_pred"), col("quality"), col("est_tokens"),
        md5(col("scrubbed").cast("binary")).as("scrub_hash"))
  }
}
