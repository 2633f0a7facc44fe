package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{PolyBinocularModel, PolyMapModel}

/** W10: binocular stream merge — the reference's stateful pairing of two
  * per-eye pupil streams into one gaze stream
  * (Binocular_Gaze_Mapper.on_pupil_datum,
  * /root/reference/vedb_gaze/externals/gaze_mappers.py:93-152).
  *
  * Semantics (per time-ordered pupil datum):
  *  - each datum enters its eye's queue; the pairing cutoff is
  *    2 × EMA-smoothed frame interval (max of the two eyes' mean intervals,
  *    smoothing factor 1/50, initial 1/120 s — :33-36, 71-91);
  *  - a low-confidence (< 0.6) queue head maps monocularly immediately;
  *  - else if both queues are non-empty: pop the older head; if the pair is
  *    within the cutoff, map binocularly (avg ts, avg conf), else map the
  *    older point monocularly;
  *  - else a queue longer than 10 drains monocularly.
  *
  * Batch runs the same FSM per session in flatMapGroups over the
  * time-sorted rows (batch = the spec, SURVEY §7.5); streaming runs it in
  * flatMapGroupsWithState with the queues + EMA as the group state, which
  * matches batch output when events arrive in timestamp order.
  */
object BinocularMerge {

  case class Pupil(session: String, timestamp: Double, id: Int,
                   x: Double, y: Double, confidence: Double)

  case class Gaze(session: String, timestamp: Double, topic: String,
                  confidence: Double, x0: Double, y0: Double,
                  x1: Double, y1: Double, binocular: Boolean)

  case class MergeState(eye0: List[Pupil], eye1: List[Pupil], ema: Double)

  val MinConfidence = 0.6
  val SampleCutoff = 10
  val Smoothing = 1.0 / 50.0
  val InitialFrameInterval = 1.0 / 120.0

  /** The FSM core: feed one datum, return (emitted gaze, new state).
    * Pure function — shared verbatim by the batch and streaming paths. */
  def step(st: MergeState, p: Pupil): (Seq[Gaze], MergeState) = {
    var eye0 = st.eye0; var eye1 = st.eye1
    if (p.id == 0) eye0 = eye0 :+ p else eye1 = eye1 :+ p

    def meanDiff(q: List[Pupil]): Option[Double] =
      if (q.length >= 2)
        Some(q.sliding(2).map(w => w(1).timestamp - w(0).timestamp).sum / (q.length - 1))
      else None
    val raw = (meanDiff(eye0), meanDiff(eye1)) match {
      case (Some(a), Some(b)) => Some(math.max(a, b))
      case (a, b) => a.orElse(b)
    }
    val ema = raw match {
      case Some(r) => st.ema + (r - st.ema) * Smoothing
      case None => st.ema
    }
    val cutoff = 2 * ema

    def mono(p: Pupil): Gaze =
      Gaze(p.session, p.timestamp, s"gaze.2d.${p.id}.", p.confidence,
        p.x, p.y, p.x, p.y, binocular = false)
    def bino(p0: Pupil, p1: Pupil): Gaze =
      Gaze(p0.session, (p0.timestamp + p1.timestamp) / 2.0, "gaze.2d.01.",
        (p0.confidence + p1.confidence) / 2.0, p0.x, p0.y, p1.x, p1.y,
        binocular = true)

    val out: Option[Gaze] =
      if (eye0.nonEmpty && eye0.head.confidence < MinConfidence) {
        val h = eye0.head; eye0 = eye0.tail; Some(mono(h))
      } else if (eye1.nonEmpty && eye1.head.confidence < MinConfidence) {
        val h = eye1.head; eye1 = eye1.tail; Some(mono(h))
      } else if (eye0.nonEmpty && eye1.nonEmpty) {
        val (p0, p1, older) =
          if (eye0.head.timestamp < eye1.head.timestamp) {
            val h = eye0.head; eye0 = eye0.tail; (h, eye1.head, h)
          } else {
            val h = eye1.head; eye1 = eye1.tail; (eye0.head, h, h)
          }
        if (math.abs(p0.timestamp - p1.timestamp) < cutoff) Some(bino(p0, p1))
        else Some(mono(older))
      } else if (eye0.length > SampleCutoff) {
        val h = eye0.head; eye0 = eye0.tail; Some(mono(h))
      } else if (eye1.length > SampleCutoff) {
        val h = eye1.head; eye1 = eye1.tail; Some(mono(h))
      } else None

    (out.toSeq, MergeState(eye0, eye1, ema))
  }

  /** Feed a time-ordered series through the FSM starting from `st0`;
    * returns the emitted gaze and the final state. */
  def runSeriesFrom(st0: MergeState, ps: Iterable[Pupil]): (Seq[Gaze], MergeState) = {
    var st = st0
    val out = mutable.ArrayBuffer[Gaze]()
    ps.foreach { p =>
      val (g, st2) = step(st, p); out ++= g; st = st2
    }
    (out.toSeq, st)
  }

  def runSeries(ps: Iterable[Pupil]): Seq[Gaze] =
    runSeriesFrom(MergeState(Nil, Nil, InitialFrameInterval), ps)._1

  /** Batch: one FSM per session over the time-sorted rows. */
  def mergeBatch(pupils: Dataset[Pupil]): Dataset[Gaze] = {
    import pupils.sparkSession.implicits._
    pupils.groupByKey(_.session).flatMapGroups { (_, it) =>
      runSeries(it.toSeq.sortBy(_.timestamp)).iterator
    }
  }

  /** Internal row shape carrying the event-time column the watermark is
    * defined on (timestamp seconds → TimestampType). Public only because
    * encoder codegen must reach it. */
  case class PupilEt(session: String, timestamp: Double, id: Int,
                     x: Double, y: Double, confidence: Double,
                     event_time: java.sql.Timestamp)

  /** Group state for the streaming path: the FSM state plus a WATERMARK
    * REORDER BUFFER. Rows are held in `buffer` until the watermark passes
    * their event time; only then do they feed the FSM, sorted. Rows that
    * could still be preceded by a late arrival are therefore never
    * replayed early, so cross-BATCH disorder (a later micro-batch carrying
    * earlier event times, within the watermark delay) produces exactly the
    * batch FSM output — the in-order-arrival assumption moves from the
    * input contract to the watermark, which is the streaming-correct
    * form. */
  case class BufferedState(buffer: List[Pupil], fsm: MergeState)

  /** Streaming: same FSM as managed group state, behind the watermark
    * reorder buffer ([[BufferedState]]). `reorder = false` bypasses the
    * buffer (rows feed the FSM the micro-batch they arrive, sorted within
    * the batch only) — the reference's in-order online assumption, with
    * minimal latency; with the default `reorder = true` emission lags
    * the watermark delay but tolerates cross-batch disorder inside it.
    *
    * State is BOUNDED: sessions idle for more than `idleTimeoutSec` of
    * EVENT time (watermark-driven) are evicted — buffered rows replay
    * through the FSM in order, remaining queued pupils drain monocularly
    * (the same shape as the queue-overflow drain) and the group state is
    * removed, so session-churn streams don't accumulate dead state. A
    * session that resumes after eviction restarts with a fresh EMA,
    * exactly like a new session. */
  def mergeStream(pupils: Dataset[Pupil], idleTimeoutSec: Double = 600.0,
                  watermarkDelay: String = "10 seconds",
                  reorder: Boolean = true): Dataset[Gaze] = {
    import pupils.sparkSession.implicits._
    val idleMillis = (idleTimeoutSec * 1000.0).toLong
    // event_time is only watermark/timeout bookkeeping; the constant shift
    // keeps sessions whose clock starts at 0 (epoch) above the operator's
    // initial watermark, which silently drops rows at/below it
    val etOffsetSec = 86400.0
    def etMs(tsSec: Double): Long =
      math.floor((tsSec + etOffsetSec) * 1000.0).toLong
    def monoDrain(q: Seq[Pupil]): Seq[Gaze] =
      q.sortBy(_.timestamp).map(p =>
        Gaze(p.session, p.timestamp, s"gaze.2d.${p.id}.", p.confidence,
          p.x, p.y, p.x, p.y, binocular = false))
    pupils
      .withColumn("event_time",
        (col("timestamp") + etOffsetSec).cast("timestamp"))
      .as[PupilEt]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.session)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, it: Iterator[PupilEt], state: GroupState[BufferedState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // eviction: replay what the watermark never released, in
            // order, THEN drain the FSM queues — same relative order the
            // rows would have fed the FSM had the stream continued
            val (flushed, fsm) =
              runSeriesFrom(st.fsm, st.buffer.sortBy(_.timestamp))
            (flushed ++ monoDrain(fsm.eye0 ++ fsm.eye1)).iterator
          } else {
            val st = state.getOption.getOrElse(
              BufferedState(Nil, MergeState(Nil, Nil, InitialFrameInterval)))
            val incoming = it.map(p =>
              Pupil(p.session, p.timestamp, p.id, p.x, p.y, p.confidence)).toList
            val all = st.buffer ++ incoming
            // release rows the watermark has passed: a future arrival is
            // guaranteed (late-row filter) to carry a LATER event time
            // than anything released here, so the FSM feed stays globally
            // time-ordered per session; strict < and the floor in etMs
            // keep the release conservative at the ms boundary
            val (release, hold) =
              if (reorder) {
                val wm = state.getCurrentWatermarkMs()
                all.partition(p => etMs(p.timestamp) < wm)
              } else (all, List.empty[Pupil])
            val (out, fsm) = runSeriesFrom(st.fsm, release.sortBy(_.timestamp))
            state.update(BufferedState(hold, fsm))
            if (incoming.nonEmpty)
              state.setTimeoutTimestamp(
                etMs(incoming.map(_.timestamp).max) + idleMillis)
            out.iterator
          }
        })
  }

  /** Apply fitted per-eye / binocular models to a merged gaze stream:
    * binocular rows use the 4-input model, monocular rows the matching
    * per-eye fallback (gaze_mappers.py:38-66). Pure Column arithmetic. */
  def applyModels(gaze: DataFrame, bino: PolyBinocularModel,
                  eye0: PolyMapModel, eye1: PolyMapModel): DataFrame = {
    val (bx, by) = bino.mapCols(col("x0"), col("y0"), col("x1"), col("y1"))
    val (m0x, m0y) = eye0.mapCols(col("x0"), col("y0"))
    val (m1x, m1y) = eye1.mapCols(col("x1"), col("y1"))
    val isEye0 = col("topic") === "gaze.2d.0."
    gaze
      .withColumn("gaze_x",
        when(col("binocular"), bx).when(isEye0, m0x).otherwise(m1x))
      .withColumn("gaze_y",
        when(col("binocular"), by).when(isEye0, m0y).otherwise(m1y))
  }
}
