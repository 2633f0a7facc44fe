package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** W11: ROI-tracked detection — the reference's stateful scan optimization
  * (CircleTracker.update, externals/circle_detector.py:22-202): run the
  * expensive full-frame detector every `fullFrameEvery` frames or when the
  * tracked ROI loses the target; otherwise detect only inside the ROI
  * predicted from the previous hit. Semantics-neutral (a detector hit is
  * a hit either way); purely a cost optimization, so the engine treats it
  * as a partition-local stateful map over frame order.
  *
  * Frames must be partition-local and time-ordered per group (the video
  * batch-scan shape S1 guarantees it: one partition = one frame-range
  * batch). The detector is a caller-provided kernel
  * (x, y, w, h bounds) → Option[(cx, cy)] in frame coordinates.
  */
object RoiTracker {

  case class Roi(x: Double, y: Double, w: Double, h: Double)

  /** @param detect  (frameIndex, searchRoi) → detection centre, if any
    * @param frameW/frameH full-frame bounds
    * @param pad      ROI half-width around the last hit
    */
  def track(frameIndices: Iterator[Long], detect: (Long, Roi) => Option[(Double, Double)],
            frameW: Double, frameH: Double, pad: Double,
            fullFrameEvery: Int = 30): Iterator[(Long, Option[(Double, Double)], Boolean)] = {
    val full = Roi(0, 0, frameW, frameH)
    var last: Option[(Double, Double)] = None
    var sinceFull = 0
    frameIndices.map { i =>
      val useRoi = last.isDefined && sinceFull < fullFrameEvery
      val roi = if (useRoi) {
        val (cx, cy) = last.get
        Roi(math.max(0, cx - pad), math.max(0, cy - pad),
          math.min(frameW, cx + pad) - math.max(0, cx - pad),
          math.min(frameH, cy + pad) - math.max(0, cy - pad))
      } else full
      var hit = detect(i, roi)
      var usedRoi = useRoi
      if (hit.isEmpty && useRoi) { // ROI miss → fall back to full frame
        hit = detect(i, full)
        usedRoi = false
      }
      if (usedRoi) sinceFull += 1 else sinceFull = 0
      last = hit.orElse(last)
      (i, hit, usedRoi)
    }
  }

  /** DataFrame form: per group (session), ordered by frame index, emit
    * (group cols..., frame_index, det_x, det_y, used_roi). The detector
    * here is the engine-side seam — tests plant a synthetic trajectory. */
  def trackFrames(df: DataFrame, frameCol: String, groupCols: Seq[String],
                  detect: (Long, Roi) => Option[(Double, Double)],
                  frameW: Double, frameH: Double, pad: Double,
                  fullFrameEvery: Int = 30): DataFrame = {
    val fIdx = df.schema.fieldIndex(frameCol)
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val outSchema = StructType(
      groupCols.map(df.schema(_)) ++ Seq(
        StructField("frame_index", LongType),
        StructField("det_x", DoubleType),
        StructField("det_y", DoubleType),
        StructField("used_roi", BooleanType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.groupByKey(r => GroupKeys.of(r, gIdx))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_.getLong(fIdx))
        val keys = gIdx.map(rows(0).get)
        track(rows.iterator.map(_.getLong(fIdx)), detect,
          frameW, frameH, pad, fullFrameEvery).map { case (i, hit, roi) =>
          Row.fromSeq(keys ++ Seq[Any](i,
            hit.map(_._1).orNull, hit.map(_._2).orNull, roi))
        }
      }
  }
}
