package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The heavy-hitter tier's stream form: counter maintenance is the
  * batch sketch lineage run as a stateful aggregate (bounded state =
  * the counter grid), and the frozen sketch serves as a row-local
  * ingest gate. Both pinned against their batch twins. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = (0L until 60L).map { i =>
    // heavy bigram "x y" planted in every 3rd doc; the rest unique-ish
    val t = if (i % 3 == 0) s"x y tail$i" else s"a$i b$i c${i % 7}"
    i -> t
  }
  private val n = 2; private val depth = 3; private val width = 64

  test("stream counters == batch sketch over the same prefix (parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counters = SketchStream.counters(
      input.toDS().toDF("doc_id", "text"), "text", n, depth, width)
    val q = counters.writeStream.format("memory").queryName("cm_counters")
      .outputMode("complete").start()
    input.addData(docs.take(25))
    q.processAllAvailable()
    input.addData(docs.drop(25))
    q.processAllAvailable()
    q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = asMap(spark.table("cm_counters"))
    val batch = asMap(TextOps.cmSketchCounters(
      docs.toDF("doc_id", "text"), "text", n, depth, width))
    assert(streamed == batch,
      "stateful sketch aggregate diverged from the batch sketch pass")
    // state is the counter grid: never more rows than depth·width
    assert(streamed.size <= depth * width)
  }

  test("oracle-shared bucket family: stream counters == batch (parity)") {
    // the family the stream_cm_counters oracle row drains — salted
    // hash60 buckets instead of xxhash64, same maintenance aggregate
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counters = SketchStream.countersShared(
      input.toDS().toDF("doc_id", "text"), "text", n, depth, width)
    val q = counters.writeStream.format("memory").queryName("cm_shared")
      .outputMode("complete").start()
    input.addData(docs.take(20))
    q.processAllAvailable()
    input.addData(docs.drop(20))
    q.processAllAvailable()
    q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = asMap(spark.table("cm_shared"))
    val batch = asMap(TextOps.cmSketchCountersShared(
      docs.toDF("doc_id", "text"), "text", n, depth, width))
    assert(streamed == batch,
      "shared-bucket stateful aggregate diverged from its batch twin")
    assert(streamed.size <= depth * width)
    // total mass law: every gram lands in exactly `depth` buckets
    val grams = docs.map(_._2.trim.split(" ", -1).length)
      .map(t => math.max(0, t - (n - 1))).sum
    assert(streamed.values.sum == depth.toLong * grams)
  }

  test("frozen sketch gates a stream row-locally == batch prefilter") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = docs.toDF("doc_id", "text")
    val maps = TextOps.cmSketchMaps(
      TextOps.cmSketchCounters(corpus, "text", n, depth, width), depth)
    val minCount = 10L
    // batch truth: docs whose any bigram estimate clears the gate
    val want = corpus
      .filter(TextOps.cmHeavyFlag(col("text"), maps, n, width, minCount))
      .select("doc_id").as[Long].collect().toSet
    assert(want == docs.collect { case (i, _) if i % 3 == 0 => i }.toSet,
      "fixture: exactly the planted heavy-gram docs should flag")
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .filter(SketchStream.heavyFlag(col("text"), maps, n, width, minCount))
      .select("doc_id")
      .writeStream.format("memory").queryName("cm_gate")
      .outputMode("append").start()
    input.addData(docs.take(31))
    q.processAllAvailable()
    input.addData(docs.drop(31))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cm_gate").as[Long].collect().toSet
    assert(got == want, "stream gate diverged from the batch prefilter")
  }
}
