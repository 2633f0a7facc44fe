package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class BinocularMergeSpec extends SparkSpec {
  import BinocularMerge._

  val rng = new scala.util.Random(21)

  /** interleaved 120 Hz per-eye streams with some low-confidence data */
  def mkPupils(n: Int): Seq[Pupil] =
    (0 until n).flatMap { i =>
      val t = i / 120.0
      Seq(
        Pupil("s1", t, 0, 0.4 + 0.001 * i, 0.5, if (i % 7 == 3) 0.3 else 0.9),
        Pupil("s1", t + 0.001, 1, 0.6, 0.5 - 0.001 * i, 0.95))
    }

  test("FSM pairs temporally-close high-confidence data binocularly") {
    val out = runSeries(mkPupils(50))
    assert(out.nonEmpty)
    val bino = out.filter(_.binocular)
    val mono = out.filterNot(_.binocular)
    assert(bino.nonEmpty && mono.nonEmpty)
    // low-confidence rows (i % 7 == 3 on eye0) must map monocularly
    assert(mono.exists(_.topic == "gaze.2d.0."))
    // binocular rows carry averaged timestamp/confidence
    bino.foreach { g => assert(g.confidence > 0.6) }
  }

  test("m9_binocular planted timing: closed-form schedule N bino / N-1 mono") {
    // the m9_binocular oracle's count law: eye gap 0.002 s < constant
    // 1/60 s cutoff < >=1 s inter-event gap, queues never hold two
    // same-eye points (EMA pinned at its 1/120 init) => one binocular
    // pair per event, each leftover eye1 point drains monocularly at the
    // next event, the last never drains
    for (n <- Seq(1, 2, 5, 40)) {
      val ps = (0 until n).flatMap { i =>
        Seq(Pupil("cal", i + 0.002, 0, 0.1 * i, 0.2, 0.95),
            Pupil("cal", i + 0.004, 1, 0.3, 0.1 * i, 0.95))
      }
      val out = runSeries(ps)
      assert(out.count(_.binocular) == n, s"n=$n bino")
      assert(out.count(!_.binocular) == n - 1, s"n=$n mono")
      assert(out.filterNot(_.binocular).forall(_.topic == "gaze.2d.1."))
      // binocular pairs are intra-event: both coords from the same i
      out.filter(_.binocular).zipWithIndex.foreach { case (g, i) =>
        assert(g.x0 == 0.1 * i && g.y1 == 0.1 * i, s"n=$n pair $i")
      }
    }
  }

  test("far-apart eyes fall back to monocular") {
    val ps = Seq(
      Pupil("s", 0.0, 0, 0.1, 0.1, 0.9),
      Pupil("s", 5.0, 1, 0.2, 0.2, 0.9), // 5 s apart >> 2×EMA cutoff
      Pupil("s", 5.01, 1, 0.2, 0.2, 0.9),
      Pupil("s", 5.02, 1, 0.2, 0.2, 0.9))
    val out = runSeries(ps)
    assert(out.forall(!_.binocular))
  }

  test("batch merge distributes per session and matches the serial FSM") {
    import spark.implicits._
    val ps = mkPupils(40) ++ mkPupils(40).map(_.copy(session = "s2"))
    val got = mergeBatch(ps.toDS()).collect()
      .groupBy(_.session).view.mapValues(_.sortBy(_.timestamp).toSeq).toMap
    val expect = runSeries(mkPupils(40).sortBy(_.timestamp))
    assert(got("s1").map(g => (g.timestamp, g.topic)) ==
      expect.sortBy(_.timestamp).map(g => (g.timestamp, g.topic)))
    assert(got("s2").size == got("s1").size)
  }

  test("streaming merge equals batch on ordered input (parity, SURVEY §5.5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pupil]
    // default trigger: AvailableNow snapshots offsets at start and races
    // with addData-after-start (can terminate on an empty snapshot)
    // reorder = false: the reference's in-order online contract — rows
    // feed the FSM the batch they arrive (minimal latency, no buffer)
    val query = mergeStream(input.toDS(), reorder = false)
      .writeStream.format("memory").queryName("gaze_stream")
      .outputMode("append").start()
    val ps = mkPupils(40)
    // two micro-batches, split mid-stream: state must carry across
    input.addData(ps.take(40))
    query.processAllAvailable()
    input.addData(ps.drop(40))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("gaze_stream").as[Gaze].collect()
      .sortBy(_.timestamp)
    val batch = runSeries(ps).sortBy(_.timestamp)
    assert(streamed.map(g => (g.timestamp, g.topic, g.binocular)).toSeq ==
      batch.map(g => (g.timestamp, g.topic, g.binocular)))
  }

  test("watermark buffer replays cross-batch disorder in event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pupil]
    val query = mergeStream(input.toDS(), idleTimeoutSec = 5.0)
      .writeStream.format("memory").queryName("gaze_disorder")
      .outputMode("append").start()
    val ps = mkPupils(40) // 80 rows spanning 0 .. 0.34 s
    // CROSS-BATCH disorder: the later two thirds arrive first, the
    // earliest rows arrive a micro-batch later (0.34 s of disorder, well
    // inside the 10 s watermark delay). Without the buffer the FSM would
    // see the early rows after the late ones and pair them wrongly.
    input.addData(ps.drop(26))
    query.processAllAvailable()
    input.addData(ps.take(26))
    query.processAllAvailable()
    // a far-future session advances the watermark past s1's idle timeout;
    // the batch after that fires the eviction, which flushes the buffer
    // through the FSM in order and drains the leftover queues mono
    input.addData(Seq(Pupil("zz", 100.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    input.addData(Seq(Pupil("zz", 101.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("gaze_disorder").as[Gaze].collect()
      .filter(_.session == "s1").sortBy(g => (g.timestamp, g.topic)).toSeq
    val batchOut = runSeries(ps).sortBy(g => (g.timestamp, g.topic))
    // every batch-FSM emission appears identically …
    val streamedSet = streamed.map(g => (g.timestamp, g.topic, g.binocular)).toSet
    assert(batchOut.forall(g =>
      streamedSet.contains((g.timestamp, g.topic, g.binocular))),
      "buffered replay diverged from the batch FSM")
    // … and the only extras are the eviction's monocular tail drain
    val extras = streamed.map(g => (g.timestamp, g.topic, g.binocular)).toSet --
      batchOut.map(g => (g.timestamp, g.topic, g.binocular)).toSet
    assert(extras.forall(!_._3), s"unexpected non-drain extras: $extras")
  }

  test("idle sessions are evicted by the event-time timeout (queues drained mono)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pupil]
    val query = mergeStream(input.toDS(), idleTimeoutSec = 5.0,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("gaze_evict")
      .outputMode("append").start()
    // session a: 3 eye0-only pupils — nothing pairs, all three sit queued
    input.addData(Seq(
      Pupil("a", 0.00, 0, 0.1, 0.1, 0.9),
      Pupil("a", 0.01, 0, 0.1, 0.1, 0.9),
      Pupil("a", 0.02, 0, 0.1, 0.1, 0.9)))
    query.processAllAvailable()
    assert(spark.table("gaze_evict")
      .filter(org.apache.spark.sql.functions.col("session") === "a").count() == 0)
    // session b far in the future advances the watermark past a's timeout …
    input.addData(Seq(Pupil("b", 100.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    // … and the next micro-batch fires a's timeout: queued rows drain mono
    input.addData(Seq(Pupil("b", 101.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    query.stop()
    val drained = spark.table("gaze_evict").as[Gaze].collect()
      .filter(_.session == "a").sortBy(_.timestamp)
    assert(drained.length == 3)
    assert(drained.forall(g => !g.binocular && g.topic == "gaze.2d.0."))
  }

  test("streaming twin of m9_binocular: merge→apply ≡ batch across micro-batch splits") {
    import spark.implicits._
    import graft.model.{PolyBinocularModel, PolyMapModel}
    implicit val sqlCtx = spark.sqlContext
    // the m9_binocular planted timing (eye gap 0.002 s inside the cutoff,
    // ≥1 s between events) with non-trivial coordinates per eye
    val n = 20
    val ps = (0 until n).flatMap { i =>
      Seq(Pupil("cal", i + 0.002, 0, 0.05 + 0.01 * i, 0.2 + 0.005 * i, 0.95),
          Pupil("cal", i + 0.004, 1, 0.3 - 0.004 * i, 0.1 + 0.007 * i, 0.95))
    }
    // fixed models (coef order (x, y, 1) / (x0, y0, x1, y1, 1)): the twin
    // pins the merge→apply COMPOSITION, not a fit
    val bino = PolyBinocularModel(
      Array(0.4, 0.1, 0.3, 0.05, 0.01), Array(0.05, 0.45, 0.1, 0.35, 0.02), 5)
    val eye0 = PolyMapModel(Array(0.9, 0.1, 0.02), Array(-0.1, 0.85, 0.03), 3)
    val eye1 = PolyMapModel(Array(0.8, -0.05, 0.1), Array(0.2, 0.7, -0.01), 3)
    def mappedKeys(gaze: org.apache.spark.sql.DataFrame) =
      BinocularMerge.applyModels(gaze, bino, eye0, eye1).collect()
        .map(r => (r.getAs[Double]("timestamp"), r.getAs[String]("topic"),
          r.getAs[Boolean]("binocular"), r.getAs[Double]("gaze_x"),
          r.getAs[Double]("gaze_y"))).sortBy(t => (t._1, t._2)).toSeq
    // expected: the pure FSM over the ordered series PLUS its eviction
    // drain (leftover queued pupils mono, in time order) — what the
    // stream emits once the watermark evicts the idle session — mapped
    // through the SAME applyModels Columns
    val (out, st) = runSeriesFrom(
      MergeState(Nil, Nil, InitialFrameInterval), ps.sortBy(_.timestamp))
    val drain = (st.eye0 ++ st.eye1).sortBy(_.timestamp).map(p =>
      Gaze(p.session, p.timestamp, s"gaze.2d.${p.id}.", p.confidence,
        p.x, p.y, p.x, p.y, binocular = false))
    val expected = mappedKeys((out ++ drain).toDS().toDF())
    // stream: watermark reorder buffer, CROSS-BATCH disorder (the later
    // two thirds arrive a micro-batch before the earliest rows)
    val input = MemoryStream[Pupil]
    // watermark delay must cover the full 19 s of cross-batch disorder
    // (the planted schedule spans n seconds); rows later than the delay
    // would be dropped at the watermark, not buffered
    val query = BinocularMerge.applyModels(
        mergeStream(input.toDS(), idleTimeoutSec = 5.0,
          watermarkDelay = "60 seconds").toDF(),
        bino, eye0, eye1)
      .writeStream.format("memory").queryName("gaze_m9_twin")
      .outputMode("append").start()
    input.addData(ps.drop(14))
    query.processAllAvailable()
    input.addData(ps.take(14))
    query.processAllAvailable()
    // far-future session advances the watermark past cal's idle timeout;
    // the next batch fires the eviction (buffer replay + mono drain)
    input.addData(Seq(Pupil("zz", 1000.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    input.addData(Seq(Pupil("zz", 1001.0, 0, 0.2, 0.2, 0.9)))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("gaze_m9_twin")
      .filter(org.apache.spark.sql.functions.col("session") === "cal")
      .collect()
      .map(r => (r.getAs[Double]("timestamp"), r.getAs[String]("topic"),
        r.getAs[Boolean]("binocular"), r.getAs[Double]("gaze_x"),
        r.getAs[Double]("gaze_y"))).sortBy(t => (t._1, t._2)).toSeq
    // exact ≡ including the mapped coordinates (same Column arithmetic,
    // bit-identical doubles)
    assert(streamed == expected)
    // and the planted schedule held: N binocular + N-1 mono + 1 drained tail
    assert(streamed.count(_._3) == n && streamed.count(!_._3) == n)
  }

  test("applyModels routes binocular vs per-eye models") {
    import spark.implicits._
    import graft.model.{PolyBinocularModel, PolyMapModel}
    val gaze = Seq(
      Gaze("s", 1.0, "gaze.2d.01.", 0.9, 0.1, 0.2, 0.3, 0.4, true),
      Gaze("s", 2.0, "gaze.2d.0.", 0.9, 0.1, 0.2, 0.1, 0.2, false)).toDS().toDF()
    val bino = PolyBinocularModel(
      Array(1.0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0), 5) // gx=x0, gy=y0
    val mono = PolyMapModel(Array(0, 0, 1.0), Array(0, 0, 2.0), 3) // gx=1,gy=2
    val out = BinocularMerge.applyModels(gaze, bino, mono, mono)
      .orderBy("timestamp").collect()
    assert(out(0).getAs[Double]("gaze_x") == 0.1)
    assert(out(0).getAs[Double]("gaze_y") == 0.2)
    assert(out(1).getAs[Double]("gaze_x") == 1.0)
    assert(out(1).getAs[Double]("gaze_y") == 2.0)
  }
}
