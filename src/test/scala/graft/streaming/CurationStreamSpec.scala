package graft.streaming

import graft.SparkSpec
import graft.operators.{SampleOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the composed ingest-time curation
  * ([[CurationStream.curate]]): the streamed output over id-ordered
  * ingest must equal the BATCH curation pipeline's (the window-dedup →
  * decontaminate → scrub → gate → sample lineage of the
  * `curation_pipeline` query) on the same documents, for any micro-batch
  * split, with exactly ONE stateful operator (the dedup seen-set). */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  val dupText = "a decent document with the usual words and plenty of " +
    "natural flowing text in it"
  val docs = Seq(
    CurDoc(1L, "the quick brown fox jumps over the lazy dog today"), // contaminated
    CurDoc(2L, dupText),
    CurDoc(3L, dupText), // exact dup of 2 → dropped
    CurDoc(4L, "contact me at alice@example.com for the offer and all of " +
      "the details in the text"), // PII scrub
    CurDoc(5L, "der hund und die katze sind nicht das problem heute morgen " +
      "und auch sonst nie wirklich einmal"),
    CurDoc(6L, "short text"), // fails the quality gate
    CurDoc(7L, "el perro y la casa de que hablas entre el mar y la arena " +
      "de la playa ahora mismo"),
    CurDoc(8L, dupText), // second dup of 2
    CurDoc(9L, "another perfectly ordinary document of the corpus with " +
      "the expected number of common words in the middle"))

  val bench = Seq(CurDoc(100L,
    "the quick brown fox jumps over the lazy dog today")).toDF()
  lazy val benchHashes = CurationStream.benchShingleHashes(bench, "text")
  val rates = Map("en" -> 0.5, "es" -> 0.8)

  /** The BATCH pipeline lineage (mirrors Queries.curationPipeline minus
    * the source split — the bench set arrives separately here). */
  def batchCurate(df: DataFrame): DataFrame = {
    val wdup = Window.partitionBy(md5(col("text").cast("binary")))
      .orderBy(col("doc_id"))
    val uniq = df.withColumn("_rn", row_number().over(wdup))
      .filter(col("_rn") === 1).drop("_rn")
    val clean = TextOps.decontaminate(uniq, bench, "doc_id", "text",
        minOverlap = 5)
      .filter(!col("contaminated")).select(col("doc"))
      .join(uniq.select(col("doc_id").cast("long").as("doc"), col("text")),
        "doc")
    val scrubbed = TextOps.piiScrub(clean, "doc", "text")
      .select(col("doc"), col("scrubbed"))
    val kept = TextOps.qualityScore(scrubbed.withColumnRenamed("doc", "doc_id"),
        "doc_id", "scrubbed")
      .filter(col("quality") >= 0.6)
      .select(col("doc"), col("est_tokens"), col("quality"))
      .join(scrubbed, "doc")
    val lang = TextOps.langId(kept.withColumnRenamed("doc", "doc_id"),
        "doc_id", "scrubbed")
      .select(col("doc"), col("lang_pred"))
    SampleOps.stratified(lang, "doc", "lang_pred", rates,
        defaultRate = 1.0, salt = "s42")
      .join(kept, "doc")
      .select(col("doc"), col("lang_pred"), col("quality"), col("est_tokens"),
        md5(col("scrubbed").cast("binary")).as("scrub_hash"))
  }

  def streamCurate(splits: Seq[Seq[CurDoc]]): (Seq[org.apache.spark.sql.Row], Int) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurDoc]
    val name = s"curation_${splits.map(_.size).mkString("_")}"
    val q = CurationStream.curate(input.toDF(), "doc_id", "text",
        benchHashes, minOverlap = 5, minQuality = 0.6, rates,
        defaultRate = 1.0, salt = "s42")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    splits.foreach { s => input.addData(s); q.processAllAvailable() }
    val stateOps = Option(q.lastProgress).toSeq.flatMap(_.stateOperators).size
    q.stop()
    (spark.table(name).orderBy("doc").collect().toSeq, stateOps)
  }

  test("stream == batch across micro-batch splits; one state op (dedup)") {
    val want = batchCurate(docs.toDF()).orderBy("doc").collect().toSeq
    assert(want.nonEmpty)
    val wantDocs = want.map(_.getLong(0)).toSet
    // the planted drops actually dropped
    assert(!wantDocs.contains(1L) && !wantDocs.contains(3L) &&
      !wantDocs.contains(6L) && !wantDocs.contains(8L))
    for (splits <- Seq(
        Seq(docs.take(3), docs.slice(3, 6), docs.drop(6)),
        Seq(docs.take(1), docs.slice(1, 8), docs.drop(8)),
        Seq(docs))) {
      val (got, nState) = streamCurate(splits)
      assert(nState == 1, s"expected exactly the dedup state op, got $nState")
      assert(got == want, s"split ${splits.map(_.size)}: $got != $want")
    }
  }

  test("batch invocation of the same chain equals the batch pipeline") {
    val got = CurationStream.curate(docs.toDF(), "doc_id", "text",
        benchHashes, minOverlap = 5, minQuality = 0.6, rates,
        defaultRate = 1.0, salt = "s42")
      .orderBy("doc").collect().toSeq
    assert(got == batchCurate(docs.toDF()).orderBy("doc").collect().toSeq)
  }

  // ------------------------------------------ TTL-bounded dedup state

  // offset from epoch 0: Spark's initial watermark is 0, and a row AT the
  // watermark is late — event times must start strictly above it
  def tsDoc(id: Long, text: String, sec: Long) =
    CurTsDoc(id, text, new java.sql.Timestamp((86400 + sec) * 1000))

  def runTtl(batches: Seq[Seq[CurTsDoc]], ttlMs: Long): Seq[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurTsDoc]
    val name = s"ttl_${ttlMs}_${batches.map(_.size).mkString("_")}"
    val q = CurationStream.dedupExactStreamTtl(input.toDF(), "doc_id",
        "text", "ts", ttlMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
  }

  test("TTL dedup: in-window dups drop, evicted keys re-admit (bounded state)") {
    val batches = Seq(
      // watermark after batch: 5s. A and B emit; horizons 30s/35s (ttl 30s)
      Seq(tsDoc(1, "text aaa", 0), tsDoc(2, "text bbb", 5)),
      // dup of A inside its window → dropped (state alive); C advances the
      // watermark to 100s at batch end, past both horizons
      Seq(tsDoc(3, "text aaa", 10), tsDoc(4, "text ccc", 100)),
      // no data for A/B in this batch → their timed-out state is evicted
      Seq(tsDoc(5, "text ddd", 150)),
      // dup of A AFTER eviction → re-admitted (the documented recall
      // tradeoff of bounding the seen-set)
      Seq(tsDoc(6, "text aaa", 160)))
    assert(runTtl(batches, ttlMs = 30000) == Seq(1L, 2L, 4L, 5L, 6L))
  }

  test("dedup is collision-safe: a caller __graft_dedup_key column survives") {
    val df = docs.take(4).toDF()
      .withColumn("__graft_dedup_key", concat(lit("keep"), col("doc_id")))
    val out = CurationStream.dedupExactStream(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // the caller's column came through untouched (not replaced by the md5)
    assert(out.map(_.getAs[String]("__graft_dedup_key")).toSeq ==
      Seq("keep1", "keep2", "keep4"))
  }

  test("TTL dedup drops null-event-time rows instead of NPEing") {
    val batches = Seq(Seq(tsDoc(1, "text aaa", 0),
      CurTsDoc(2, "text bbb", null)))
    assert(runTtl(batches, ttlMs = 30000) == Seq(1L))
  }

  test("TTL dedup: with TTL >= feed span it equals the unbounded form") {
    val batches = Seq(
      Seq(tsDoc(1, "text aaa", 0), tsDoc(2, "text bbb", 5)),
      Seq(tsDoc(3, "text aaa", 10), tsDoc(4, "text ccc", 100)),
      Seq(tsDoc(5, "text ddd", 150)),
      Seq(tsDoc(6, "text aaa", 160)))
    // unbounded replay of the same feed: 6 (the late dup) must stay dropped
    assert(runTtl(batches, ttlMs = 1000L * 1000) == Seq(1L, 2L, 4L, 5L))
  }
}

case class CurDoc(doc_id: Long, text: String)
case class CurTsDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
