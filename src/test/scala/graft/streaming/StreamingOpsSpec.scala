package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class Ev(user: String, ts: java.sql.Timestamp)

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(sec: Double): java.sql.Timestamp =
    new java.sql.Timestamp((sec * 1000).toLong)

  test("sessionizeStream closes sessions on the gap (= batch W2 semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionizeStream(
        input.toDF().withWatermark("ts", "1 hour"), "ts", Seq("user"), "15 seconds")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // two sessions for u1 (gap 100 s), one for u2
    input.addData(
      Ev("u1", ts(0)), Ev("u1", ts(5)), Ev("u1", ts(10)),
      Ev("u1", ts(110)), Ev("u1", ts(112)),
      Ev("u2", ts(50)))
    q.processAllAvailable()
    // watermark-advancing sentinel batches so all sessions close
    input.addData(Ev("zz", ts(100000)))
    q.processAllAvailable()
    input.addData(Ev("zz", ts(200000)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess").orderBy("user", "session_start").collect()
    val u1 = rows.filter(_.getString(0) == "u1")
    assert(u1.length == 2)
    assert(u1(0).getAs[Long]("n") == 3 && u1(1).getAs[Long]("n") == 2)
    // batch equivalent on the same data
    val batch = graft.operators.TimeSeriesOps.sessionize(
      Seq(0.0, 5.0, 10.0, 110.0, 112.0).map(("u1", _)).toDF("user", "t"),
      "t", Seq("user"), 15.0)
    assert(batch.select("session_id").distinct().count() == 2)
  }

  test("slidingRateStream counts per sliding window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.slidingRateStream(
        input.toDF().withWatermark("ts", "1 hour"), "ts", Seq("user"),
        "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("rate")
      .outputMode("append").start()
    input.addData(Ev("u", ts(1)), Ev("u", ts(2)), Ev("u", ts(7)), Ev("u", ts(12)))
    q.processAllAvailable()
    input.addData(Ev("zz", ts(100000)))
    q.processAllAvailable()
    input.addData(Ev("zz", ts(200000)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rate").filter($"user" === "u").collect()
    assert(rows.nonEmpty)
    // the window covering [0,10) must count 3
    assert(rows.exists(_.getAs[Long]("rate") == 3))
  }
}
