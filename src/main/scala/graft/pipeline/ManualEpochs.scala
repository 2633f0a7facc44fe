package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6/`split_time`: manual epoch ranges from `marker_times.yaml`
  * (pipelines.py:519-539). The session operator curates calibration /
  * validation frame ranges by hand; the pipeline reads them and limits
  * each detection scan to its epoch's frame range (the O4 frame-range
  * limit — a pushdown-able predicate, not a post-filter).
  *
  * File shape (the reference's vedb-specific keys):
  * {{{
  * calibration_frames:
  *   - [1200, 4400]
  * validation_frames:
  *   - [9000, 10000]
  *   - [30000, 31000]
  * }}}
  */
object ManualEpochs {

  /** One manual epoch: index + [startFrame, endFrame]. */
  case class Epoch(epoch: Int, startFrame: Long, endFrame: Long)

  /** split_time parity: epochs under `key` ('calibration_frames' /
    * 'validation_frames'); missing key → empty; the single degenerate
    * `[x, x]` epoch → empty (the reference's "not annotated" marker,
    * pipelines.py:534-538). */
  def splitTime(markerTimeFile: String, key: String): Seq[Epoch] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(markerTimeFile)),
      "UTF-8")
    val root = Option(yaml.load[java.util.Map[String, Any]](text))
      .map(_.asScala).getOrElse(Map.empty[String, Any])
    root.get(key) match {
      case Some(l: java.util.List[_]) =>
        val ranges = l.asScala.toSeq.map {
          case pair: java.util.List[_] =>
            val p = pair.asScala.toSeq.map(x => x.toString.toLong)
            require(p.length == 2, s"epoch range needs 2 frames, got $p")
            (p(0), p(1))
          case other =>
            throw new IllegalArgumentException(s"bad epoch entry: $other")
        }
        if (ranges.length == 1 && ranges.head._1 == ranges.head._2) Nil
        else ranges.zipWithIndex.map { case ((s, e), i) => Epoch(i, s, e) }
      case _ => Nil
    }
  }

  /** Tag rows with their manual epoch and drop rows outside every range.
    * Ranges follow the reference's slice semantics — start inclusive,
    * end exclusive. Row-drop happens via the plain range DISJUNCTION on
    * `frameCol`, which is pushdown-eligible when `frameCol` is a scan
    * column (O4); the epoch tag is a derived CASE on top.
    *
    * Single-pass tagging assigns each row to exactly ONE epoch (ranges
    * are expected disjoint; on overlap the LAST matching range wins).
    * The reference scans each range independently, so an overlapping
    * frame lands in every epoch it covers — for that duplication
    * semantics slice per range instead (the manual pipeline branch,
    * [[VedbPipeline.manualStages]], does). */
  def applyEpochs(df: DataFrame, frameCol: String,
                  epochs: Seq[Epoch]): DataFrame = {
    if (epochs.isEmpty)
      return df.withColumn("epoch", lit(null).cast("int")).limit(0)
    val f = col(frameCol)
    val inAny: Column = epochs
      .map(e => f >= e.startFrame && f < e.endFrame).reduce(_ || _)
    val tag: Column = epochs.foldLeft(lit(null).cast("int")) { (acc, e) =>
      when(f >= e.startFrame && f < e.endFrame, lit(e.epoch)).otherwise(acc)
    }
    df.filter(inAny).withColumn("epoch", tag)
  }

  /** Apply FRAME-indexed manual epochs to a TIMESTAMPED table: the frame
    * index of each row is its searchsorted position in the world clock
    * (J6 — the reference's timestamps are per-frame, so position ≡ frame
    * number), then [[applyEpochs]] tags and filters. The filter sits
    * above the window-computed frame index, so no scan pruning here —
    * callers with a REAL frame column should apply [[applyEpochs]] to it
    * directly. This is the `split_time` → per-epoch-scan composition of
    * pipeline_vedb (pipelines.py:630-649) expressed over detection
    * tables. */
  def splitByFrames(df: DataFrame, clock: DataFrame, tsCol: String,
                    clockTs: String, epochs: Seq[Epoch],
                    keys: Seq[String] = Nil): DataFrame = {
    val withFrame = graft.operators.TimeSeriesOps.searchSorted(
      df, clock, tsCol, clockTs, keys)
    applyEpochs(withFrame, "frame_index", epochs)
  }
}
