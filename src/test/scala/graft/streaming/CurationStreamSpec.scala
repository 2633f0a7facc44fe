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
}

case class CurDoc(doc_id: Long, text: String)
