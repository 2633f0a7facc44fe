package graft.streaming

import scala.collection.mutable

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame

object RestartRecoverySpec {
  /** foreachBatch target keyed by batchId: a re-delivered batch after
    * restart OVERWRITES its slot instead of double-counting — the
    * downstream contract foreachBatch consumers carry anyway. */
  val drained: mutable.Map[Long, Seq[(Long, Long, Double)]] =
    mutable.Map.empty
}

/** Restart-recovery parity for the stateful streaming twins (r12 verdict
  * #3): the micro-batch-split parity specs prove the state TRANSITION is
  * arrival-order-free, but never killed a query and resumed it from its
  * checkpoint — the state-store round-trip (serialize → HDFSBackedStore
  * files → deserialize) is the one streaming axis a single uninterrupted
  * run can't exercise, and at cluster scale every long-lived query
  * crosses it. Each test: run a prefix, STOP the query, restart from the
  * same checkpointLocation, feed the rest, and assert the drained result
  * is identical to the uninterrupted run — including pairs/counters that
  * SPAN the restart (proof the state, not just the offsets, came back). */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_restart").toString

  test("sketch counters recover: stop/restart == uninterrupted == batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs: Seq[(Long, String)] = (0L until 60L).map { i =>
      val t = if (i % 3 == 0) s"x y tail$i" else s"a$i b$i c${i % 7}"
      i -> t
    }
    val (n, depth, width) = (2, 3, 64)
    val cp = tmp()
    val input = MemoryStream[(Long, String)]
    def start() = SketchStream.countersShared(
        input.toDS().toDF("doc_id", "text"), "text", n, depth, width)
      .writeStream.format("memory").queryName("cm_restart")
      .option("checkpointLocation", cp)
      .outputMode("complete").start()

    val q1 = start()
    input.addData(docs.take(35))
    q1.processAllAvailable()
    q1.stop() // hard stop mid-stream: state lives only in the checkpoint
    input.addData(docs.drop(35))
    val q2 = start() // recovery path: offsets + state store reload
    q2.processAllAvailable()
    q2.stop()

    def asMap(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = asMap(spark.table("cm_restart"))
    val batch = asMap(TextOps.cmSketchCountersShared(
      docs.toDF("doc_id", "text"), "text", n, depth, width))
    assert(streamed == batch,
      "restarted sketch aggregate diverged from the batch twin")
    // the pre-stop mass is only reachable through the recovered state:
    // a counter fed by BOTH halves must exceed the post-restart half
    val heavyAfterRestart = docs.drop(35).count(_._2.startsWith("x y"))
    assert(batch.values.max > heavyAfterRestart,
      "fixture too weak: no counter spans the restart")
    spark.catalog.dropTempView("cm_restart")
  }

  test("dedup candidate state recovers: cross-restart pairs still found") {
    implicit val sqlCtx = spark.sqlContext
    val docs: Seq[(Long, String)] = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear here without overlap whatsoever"),
      (4L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "unrelated tokens that no other document shares at all"),
      (6L, "the quick brown fox jumps over that lazy dog today"))
    val cp = tmp()
    RestartRecoverySpec.drained.clear()
    val input = MemoryStream[(Long, String)]
    def start() = DedupStream.candidatesStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DedupStream.CandPair],
                       batchId: Long) =>
        RestartRecoverySpec.drained.synchronized {
          RestartRecoverySpec.drained(batchId) = batch.collect()
            .map(p => (p.doc_a, p.doc_b, p.est_jaccard)).toSeq
        }
      }
      .outputMode("append").start()

    // phase 1: docs 1-3 accepted into buckets, then the query dies
    val q1 = start()
    input.addData(docs.take(3))
    q1.processAllAvailable()
    q1.stop()
    // phase 2: docs 4-6 arrive AFTER the restart; their duplicates are
    // all in phase 1, so every emitted pair crosses the restart
    val q2 = start()
    input.addData(docs.drop(3))
    q2.processAllAvailable()
    q2.stop()

    val streamed = RestartRecoverySpec.drained.synchronized {
      RestartRecoverySpec.drained.values.flatten.toSet
    }
    val batch = TextOps.minhashLshPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.CacheRegistry.releaseAll()
    assert(streamed == batch,
      s"restarted dedup stream diverged: got $streamed want $batch")
    // the planted exact dup (1,4) spans the restart — only reachable if
    // doc 1's bucket membership survived the state-store round-trip
    assert(streamed.exists(p => (p._1, p._2) == ((1L, 4L))),
      "cross-restart pair missing: bucket state did not recover")
  }
}
