package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.LabelingOps

class BlinkStreamSpec extends SparkSpec {
  import BlinkStream._

  // the validated blink pattern (one blink per 33-frame period)
  val pattern: Array[Double] = Array.fill(10)(1.4) ++
    Array(1.15, 0.9, 0.65, 0.4, 0.15, 0.15) ++
    Array(0.35, 0.55, 0.75, 0.95, 1.15, 1.35, 1.4) ++ Array.fill(10)(1.4)

  def series(periods: Int): Array[Double] =
    Array.fill(periods)(pattern).flatten

  test("streaming blink FSM equals batch across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dist = series(6) // 198 frames, 6 blinks
    val frames = dist.zipWithIndex.map { case (d, i) =>
      Frame("e0", i / 120.0, d)
    }
    val input = MemoryStream[Frame]
    val q = mergeStream(input.toDS(), negVel = -0.15, posVel = 0.15).writeStream
      .format("memory").queryName("blinks")
      .outputMode("append").start()
    // three uneven micro-batches, splits inside quiet zones and mid-blink
    input.addData(frames.take(40)); q.processAllAvailable()
    input.addData(frames.slice(40, 45)); q.processAllAvailable() // mid-blink
    input.addData(frames.drop(45)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("blinks").as[Blink].collect()
      .sortBy(_.onset)
    val batch = LabelingOps.blinkFsm(dist, 120.0, negVel = -0.15, posVel = 0.15)
    // streaming emits all blinks fully inside the safe prefix; the final
    // horizon (last ~92 frames) may hold the tail blinks back
    assert(streamed.nonEmpty)
    val batchOnsets = batch.map(_._1 / 120.0)
    streamed.foreach { b =>
      assert(batchOnsets.exists(o => math.abs(o - b.onset) < 1e-9),
        s"streamed blink at ${b.onset} not in batch $batchOnsets")
      assert(b.n_frames == 10L)
    }
    // at least the blinks outside the final horizon arrived
    val horizon = horizonFrames(120.0)
    val expectedEmitted = batch.count(_._2 < dist.length - horizon)
    assert(streamed.length >= expectedEmitted - 1)
  }

  test("no duplicate emissions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dist = series(8)
    val frames = dist.zipWithIndex.map { case (d, i) => Frame("x", i / 120.0, d) }
    val input = MemoryStream[Frame]
    val q = mergeStream(input.toDS(), negVel = -0.15, posVel = 0.15).writeStream
      .format("memory").queryName("blinks2")
      .outputMode("append").start()
    frames.grouped(25).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val onsets = spark.table("blinks2").as[Blink].collect().map(_.onset)
    assert(onsets.distinct.length == onsets.length)
  }
}
