package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.LabelingOps

/** W5 (streaming): the blink FSM as managed group state.
  *
  * The batch FSM (labeling.py:310-371, LabelingOps.blinkFsm) scans a whole
  * series with bounded lookahead (a blink spans ≤ maxBlinkMs). The
  * streaming form buffers per-eye frames in state, runs the same FSM over
  * the buffer each micro-batch, emits blinks that end inside the "safe"
  * prefix (everything except the trailing lookahead horizon), and trims
  * the consumed prefix.
  *
  * Exactness: emitted blinks equal the batch FSM's whenever the trim point
  * falls in a sub-threshold (quiet) zone — true between blinks on real
  * eyelid data; the horizon guarantees no blink is cut mid-phase. Batch
  * remains the spec (SURVEY §7.5).
  */
object BlinkStream {

  case class Frame(session: String, timestamp: Double, dist: Double)
  case class Blink(session: String, onset: Double, offset: Double,
                   duration: Double, n_frames: Long)
  case class BufState(ts: Array[Double], dist: Array[Double])

  /** lookahead horizon in frames: the longest structure the FSM can still
    * extend (full blink 500 ms + opening margin) at the given fps. */
  def horizonFrames(fps: Double): Int = math.ceil(fps * 0.75).toInt + 2

  def mergeStream(frames: Dataset[Frame], fps: Double = 120.0,
                  negVel: Double = -0.02, posVel: Double = 0.02): Dataset[Blink] = {
    import frames.sparkSession.implicits._
    val horizon = horizonFrames(fps)
    frames.groupByKey(_.session)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (session: String, it: Iterator[Frame], state: GroupState[BufState]) => {
          val prev = state.getOption.getOrElse(
            BufState(Array.empty, Array.empty))
          val incoming = it.toArray.sortBy(_.timestamp)
          val ts = prev.ts ++ incoming.map(_.timestamp)
          val dist = prev.dist ++ incoming.map(_.dist)
          val blinks = LabelingOps.blinkFsm(dist, fps,
            negVel = negVel, posVel = posVel)
          val safeEnd = dist.length - horizon
          val (emit, pending) = blinks.partition(_._2 < safeEnd)
          // trim the whole safe prefix (any blink starting before safeEnd
          // must end inside the buffer, so it is either emitted now or
          // pending) — but never into a pending blink. Blink-free streams
          // therefore stay bounded at the horizon.
          val trim = math.max(0, math.min(safeEnd,
            (pending.map(_._1) :+ Int.MaxValue).min))
          state.update(BufState(ts.drop(trim), dist.drop(trim)))
          emit.iterator.map { case (s, e) =>
            // half-open [s, e): mirror the reference's label slice
            Blink(session, ts(s), ts(e - 1), ts(e - 1) - ts(s), (e - s).toLong)
          }
        })
  }

  /** Flush helper for batch-driven tests / end-of-stream: run the FSM over
    * whatever remains in a buffer with no horizon. */
  def drain(session: String, st: BufState, fps: Double,
            negVel: Double = -0.02, posVel: Double = 0.02): Seq[Blink] =
    LabelingOps.blinkFsm(st.dist, fps, negVel = negVel, posVel = posVel)
      .map { case (s, e) =>
        Blink(session, st.ts(s), st.ts(e - 1), st.ts(e - 1) - st.ts(s),
          (e - s).toLong)
      }
}
