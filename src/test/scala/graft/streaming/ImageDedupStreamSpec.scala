package graft.streaming

import graft.SparkSpec
import graft.multimodal.{MultimodalOps, VisionFixtures}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Image dedup-at-ingest parity: the streamed distinct pair set must
  * equal the batch [[MultimodalOps.imageNearDupPairs]] on the same rows
  * for any micro-batch split (under-cap buckets), and the first-arrived
  * cap must bound the bucket state. */
class ImageDedupStreamSpec extends SparkSpec {
  import ImageDedupStream._
  import spark.implicits._

  // 12 media over 4 jittered content keys: exact + near twins
  val rows: Seq[(Long, Long)] = (0L to 11L).map(i => (i, (i % 4) * 2 + (i % 3) / 2))

  private def mediaOf(df: DataFrame): DataFrame =
    VisionFixtures.plantMediaKeyed(df, "doc_id", "ck", "pupil_jitter")

  def runStream(batches: Seq[Seq[(Long, Long)]],
                maxBucket: Int = 1000): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val name = s"img_dedup_${System.nanoTime()}"
    val q = candidatesStream(
        mediaOf(input.toDF().toDF("doc_id", "ck")), maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[ImgPair].collect()
      .map(p => (p.id_a, p.id_b, p.hamming)).toSet
  }

  def batchPairs(rs: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val out = MultimodalOps.imageNearDupPairs(
        mediaOf(rs.toDF("doc_id", "ck")), maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.CacheRegistry.releaseAll()
    out
  }

  test("distinct streamed pairs equal batch pairs, any split") {
    val expected = batchPairs(rows)
    assert(expected.exists(_._3 == 0L)) // planted exact twins
    assert(runStream(rows.map(Seq(_))) == expected)       // one per batch
    assert(runStream(Seq(rows)) == expected)              // single batch
    assert(runStream(Seq(rows.take(5), rows.slice(5, 6), // uneven split
      rows.drop(6))) == expected)
  }

  test("prefix property and bounded bucket state at the cap") {
    val prefix = rows.take(7)
    assert(runStream(prefix.map(Seq(_))) == batchPairs(prefix))
    // cap 1: each bucket accepts its first member only — every emitted
    // pair involves a first-arrived member, and the set is a subset of
    // the uncapped pairs
    val capped = runStream(rows.map(Seq(_)), maxBucket = 1)
    assert(capped.subsetOf(batchPairs(rows)))
  }
}
