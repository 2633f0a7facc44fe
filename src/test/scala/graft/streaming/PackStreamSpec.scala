package graft.streaming

import graft.SparkSpec
import graft.operators.{SampleOps, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for ingest-time sequence packing: the streamed
  * (doc, shard, n_tokens, chunk) layout must equal
  * [[SampleOps.packChunks]] on the same documents for any micro-batch
  * split of an id-ordered feed — with both the chars/4 estimate and the
  * EXACT merge-BPE token counts. */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  val docs = (0 until 40).map { i =>
    PackDoc(i.toLong, ("word" + i + " ") * (5 + (i * 7) % 23))
  }

  def streamed(name: String, bpe: Boolean,
               splits: Seq[Seq[PackDoc]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PackDoc]
    val tc = if (bpe) Some(TextOps.mergeBpeTokenCount(col("text"))) else None
    val q = PackStream.packChunksStream(input.toDF(), "doc_id", "text",
        contextTokens = 64, numShards = 4, tokenCount = tc)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    splits.foreach { s => input.addData(s); q.processAllAvailable() }
    q.stop()
    spark.table(name).orderBy("doc").collect().toSeq
  }

  test("stream == batch packing across micro-batch splits (chars/4 + BPE)") {
    for (bpe <- Seq(false, true)) {
      val tc = if (bpe) Some(TextOps.mergeBpeTokenCount(col("text"))) else None
      val want = SampleOps.packChunks(docs.toDF(), "doc_id", "text",
          contextTokens = 64, numShards = 4, tokenCount = tc)
        .orderBy("doc").collect().toSeq
      assert(want.nonEmpty)
      // chunks actually advance somewhere (the fixture crosses budgets)
      assert(want.map(_.getAs[Long]("chunk")).distinct.size > 1)
      for ((splits, i) <- Seq(
          Seq(docs.take(13), docs.slice(13, 29), docs.drop(29)),
          Seq(docs)).zipWithIndex) {
        val got = streamed(s"pack_${bpe}_$i", bpe, splits)
        assert(got == want, s"bpe=$bpe split=${splits.map(_.size)}")
      }
    }
  }
}

case class PackDoc(doc_id: Long, text: String)
