package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DedupStreamSpec extends SparkSpec {
  import DedupStream._

  val docs: Seq[(Long, String)] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // ~ 1
    (3L, "completely different words appear here without overlap whatsoever"),
    (4L, "the quick brown fox jumps over the lazy dog today"),   // == 1
    (5L, "unrelated tokens that no other document shares at all"),
    (6L, "the quick brown fox jumps over that lazy dog today"))  // ~ 1, 2, 4

  def runStream(batches: Seq[Seq[(Long, String)]],
                maxBucket: Int = 1000): Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val name = s"dedup_cand_${System.nanoTime()}"
    val q = candidatesStream(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[CandPair].collect()
      .map(p => (p.doc_a, p.doc_b, p.est_jaccard)).toSet
  }

  def batchPairs(rows: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    import spark.implicits._
    val out = TextOps.minhashLshPairs(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.CacheRegistry.releaseAll()
    out
  }

  test("distinct streamed pairs equal batch LSH pairs, any batch split") {
    val expected = batchPairs(docs)
    assert(expected.exists(p => (p._1, p._2) == ((1L, 4L)))) // the planted dup
    // one batch at a time, and an uneven 2/1/3 split
    assert(runStream(docs.map(Seq(_))) == expected)
    assert(runStream(Seq(docs.take(2), docs.slice(2, 3), docs.drop(3))) == expected)
    // all in a single micro-batch (same-batch pairing path)
    assert(runStream(Seq(docs)) == expected)
  }

  test("prefix property: pairs after N batches equal batch over the prefix") {
    val prefix = docs.take(4)
    assert(runStream(prefix.map(Seq(_))) == batchPairs(prefix))
  }

  test("property: random corpora, random splits — stream == batch (seeded)") {
    val vocab = Array("spark", "join", "window", "scan", "agg", "hash",
      "table", "row", "batch", "merge", "key", "value")
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      // random docs, some near-dups (shared prefix + divergent tail)
      val base = Array.fill(8 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length)))
      val corpus = (1L to 14L).map { i =>
        val toks =
          if (rng.nextBoolean()) base ++ Array.fill(1 + rng.nextInt(3))(
            vocab(rng.nextInt(vocab.length)))
          else Array.fill(6 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length)))
        (i, toks.mkString(" "))
      }
      // random micro-batch split points
      val splits = corpus.grouped(1 + rng.nextInt(5)).map(_.toSeq).toSeq
      assert(runStream(splits) == batchPairs(corpus),
        s"seed $seed: stream/batch divergence")
    }
  }

  test("bucket cap: overflow docs still pair against stored members") {
    // identical docs → same bucket in every band; cap 2 stores first two
    val same = (1L to 4L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val got = runStream(same.map(Seq(_)), maxBucket = 2)
    val gotPairs = got.map(p => (p._1, p._2))
    // 3 and 4 each pair with stored 1 and 2, but (3,4) is never stored-vs-new
    assert(gotPairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    assert(got.forall(_._3 == 1.0))
  }

  test("at-least-once: re-delivered docs (stored OR overflow) emit nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val same = (1L to 4L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val input = MemoryStream[(Long, String)]
    val name = s"dedup_redeliver_${System.nanoTime()}"
    val q = candidatesStream(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", maxBucket = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    same.foreach { d => input.addData(Seq(d)); q.processAllAvailable() }
    val firstPass = spark.table(name).as[CandPair].collect().toSeq
    // re-deliver a stored member (1) and an overflow doc (3): the overflow
    // recency buffer must recognize both, so no new pairs appear
    input.addData(Seq(same(0), same(2))); q.processAllAvailable()
    val afterRedeliver = spark.table(name).as[CandPair].collect().toSeq
    q.stop()
    assert(afterRedeliver.size == firstPass.size,
      s"re-delivery emitted ${afterRedeliver.size - firstPass.size} extra pairs")
  }
}
