package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Eye-event labeling operators (blinks, saccades).
  *
  * Reference (file:line relative to /root/reference/vedb_gaze):
  *  - blinkSegments: `_detect_blinks_eyevel` labeling.py:310-371 (W5) — a
  *    3-phase FSM (closing / closed / opening) over the eyelid-distance
  *    velocity with millisecond duration gates. Inherently sequential →
  *    runs per group inside flatMapGroups over the time-sorted series; the
  *    distributed axis is (session, eye), matching the reference's
  *    per-session arrays.
  *  - saccadeSegments: `find_saccades` labeling.py:615-676 (W6), sans the
  *    reference's vestigial ClipList dependency: velocity threshold → RLE →
  *    drop single-frame clips. Fully declarative (windows + groupBy).
  */
object LabelingOps {

  /** numpy.gradient with unit spacing over an in-memory series. */
  def gradient1(v: Array[Double]): Array[Double] = {
    val n = v.length
    if (n == 1) return Array(0.0)
    Array.tabulate(n) { i =>
      if (i == 0) v(1) - v(0)
      else if (i == n - 1) v(n - 1) - v(n - 2)
      else (v(i + 1) - v(i - 1)) / 2.0
    }
  }

  /** The reference FSM, verbatim semantics over one series: returns
    * [start, end) index pairs of detected blinks (labeling.py:310-371).
    * Velocity-threshold defaults ±0.02 follow the public `detect_blinks`
    * entry point (labeling.py:377-378); the GitW-derived module constants
    * (−0.74 / +0.59, labeling.py:304-309) are the `_detect_blinks_eyevel`
    * internal defaults — pass them explicitly for that variant. */
  def blinkFsm(
      eyelidDist: Array[Double], fps: Double,
      minClosingMs: Double = 10, maxClosingMs: Double = 250,
      maxClosureMs: Double = 17, minOpeningMs: Double = 30,
      minBlinkMs: Double = 16, maxBlinkMs: Double = 500,
      negVel: Double = -0.02, posVel: Double = 0.02): Seq[(Int, Int)] = {
    val vel = gradient1(eyelidDist)
    val msPerFrame = 1000.0 / fps
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val n = vel.length
    var i = 0
    var done = false
    while (i < n - 1) {
      if (vel(i) <= negVel) {
        val start = i
        var end = i
        done = false
        while (!done && vel(i) <= negVel) {
          end = i; i += 1
          if (i > n - 1) done = true
        }
        val closing = (end - start) * msPerFrame
        if (closing < maxClosingMs && closing > minClosingMs && !done) {
          val mid = i
          while (!done && vel(i) > negVel && vel(i) < posVel) {
            end = i; i += 1
            if (i > n - 1) done = true
          }
          if ((mid - end) * msPerFrame < maxClosureMs && !done) {
            val last = i
            while (!done && vel(i) > posVel) {
              end = i; i += 1
              if (i > n - 1) done = true
            }
            val opening = (end - last) * msPerFrame
            val total = (end - start) * msPerFrame
            if (opening > minOpeningMs && total < maxBlinkMs &&
              total > minBlinkMs && !done)
              out += ((start, end))
          }
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** W5: blink segments per group. Input needs (groupCols..., tsCol,
    * eyelidDistCol); output one row per blink: group cols + onset, offset,
    * duration, n_frames. */
  def blinkSegments(df: DataFrame, tsCol: String, distCol: String,
                    groupCols: Seq[String], fps: Double = 120.0,
                    negVel: Double = -0.02, posVel: Double = 0.02): DataFrame = {
    val spark = df.sparkSession
    val tsIdx = df.schema.fieldIndex(tsCol)
    val dIdx = df.schema.fieldIndex(distCol)
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val outSchema = StructType(
      groupCols.map(df.schema(_)) :+
        org.apache.spark.sql.types.StructField("onset", DoubleType) :+
        org.apache.spark.sql.types.StructField("offset", DoubleType) :+
        org.apache.spark.sql.types.StructField("duration", DoubleType) :+
        org.apache.spark.sql.types.StructField("n_frames", LongType))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.groupByKey(r => GroupKeys.of(r, gIdx))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_.getDouble(tsIdx))
        val dist = rows.map(_.getDouble(dIdx))
        blinkFsm(dist, fps, negVel = negVel, posVel = posVel).iterator.map {
          case (s, e) =>
            val keys = gIdx.map(rows(0).get)
            // half-open [s, e): the reference labels frames s..e-1
            // (pred_blink_labels[start:end], labeling.py:369)
            val last = e - 1
            // Seq[Any]: Scala numeric widening would silently turn the Long
            // into a Double in a unified Seq[Double]
            Row.fromSeq(keys ++ Seq[Any](
              rows(s).getDouble(tsIdx), rows(last).getDouble(tsIdx),
              rows(last).getDouble(tsIdx) - rows(s).getDouble(tsIdx),
              (e - s).toLong))
        }
      }
  }

  /** W6: saccade candidate segments — |velocity| > threshold, RLE'd, with
    * clips shorter than minFrames dropped. Velocity must already be a
    * column (compose with TimeSeriesOps.gradient). */
  def saccadeSegments(df: DataFrame, tsCol: String, velCol: String,
                      groupCols: Seq[String], velThreshold: Double = 75.0,
                      minFrames: Int = 2): DataFrame =
    TimeSeriesOps.rleSegments(df, tsCol, abs(col(velCol)) > velThreshold, groupCols)
      .filter(col("n_rows") >= minFrames)

  /** M12: PCA eyelid alignment (labeling.py:155-197, 260-276) — fit the
    * principal axes of a keypoint sample on the driver (2×2 covariance,
    * Breeze eig), sign-fix PC1 to +x, and rotate every keypoint array
    * into the aligned frame as Column arithmetic (literal rotation).
    * Returns df with `<xs>_aligned` / `<ys>_aligned`. */
  def pcaAlign(df: DataFrame, xsCol: String, ysCol: String,
               sampleN: Int = 1000): DataFrame = {
    val sample = df.select(col(xsCol), col(ysCol)).limit(sampleN).collect()
    val pts = sample.flatMap { r =>
      val xs = r.getAs[scala.collection.Seq[Double]](0)
      val ys = r.getAs[scala.collection.Seq[Double]](1)
      xs.zip(ys)
    }
    require(pts.nonEmpty, "pcaAlign: empty sample")
    val mx = pts.map(_._1).sum / pts.length
    val my = pts.map(_._2).sum / pts.length
    var sxx = 0.0; var sxy = 0.0; var syy = 0.0
    pts.foreach { case (x, y) =>
      val dx = x - mx; val dy = y - my
      sxx += dx * dx; sxy += dx * dy; syy += dy * dy
    }
    // principal axis of the 2x2 covariance: angle = atan2(2sxy, sxx-syy)/2
    val theta = 0.5 * math.atan2(2 * sxy, sxx - syy)
    var c = math.cos(theta); var s = math.sin(theta)
    if (c < 0) { c = -c; s = -s } // sign-fix: PC1 points toward +x
    val xs = col(xsCol); val ys = col(ysCol)
    df
      .withColumn(s"${xsCol}_aligned",
        zip_with(xs, ys, (x, y) => (x - mx) * c + (y - my) * s))
      .withColumn(s"${ysCol}_aligned",
        zip_with(xs, ys, (x, y) => -(x - mx) * s + (y - my) * c))
  }

  /** M13: eyelid distance — max vertical gap between the upper and lower
    * lid keypoint arrays (labeling.py:200-296, sans the pylids polynomial
    * refinement): pure array Column arithmetic. */
  def eyelidDistance(topYs: Column, bottomYs: Column): Column =
    array_max(zip_with(bottomYs, topYs, (b, t) => b - t))

  /** [[pcaAlign]] with the moments computed DISTRIBUTIVELY over the whole
    * table — the corpus-scale form: the driver receives five scalars
    * (n, Σx, Σy and the two-pass deviation sums) instead of collecting
    * every keypoint array (the sample-collect form moves O(rows·points)
    * to the driver — 76 MB at sf0.1 for the keypoint query, unbounded at
    * 100 TB). Per-row folds are HOF aggregates (fixed within-row order);
    * cross-row sum order is Spark's.
    *
    * PRECONDITION (determinism contract): cross-partition summation order
    * is nondeterministic, so the fitted (mx, my, θ) can drift by ~1e-12
    * between runs. Callers that hash or exactly compare the aligned
    * output must either (a) feed integer-valued coordinates (the first
    * pass is then FP-exact) and round the output coarsely enough that a
    * 1e-12 moment drift cannot cross a rounding boundary (≥ ~1e-7 slack
    * at round-6), or (b) accept run-to-run last-ulp variation. Use
    * [[pcaAlign]] (deterministic driver-side sample) when neither holds. */
  def pcaAlignDistributed(df: DataFrame, xsCol: String,
                          ysCol: String): DataFrame = {
    val xs = col(xsCol); val ys = col(ysCol)
    def fold(c: Column): Column = aggregate(c, lit(0.0), (a, v) => a + v)
    val first = df.agg(
      sum(size(xs).cast("long")).as("n"),
      sum(fold(xs)).as("sx"), sum(fold(ys)).as("sy")).head
    val n = first.getLong(0)
    require(n > 0, "pcaAlignDistributed: empty input")
    val mx = first.getDouble(1) / n
    val my = first.getDouble(2) / n
    val second = df.agg(
      sum(fold(transform(xs, x => (x - mx) * (x - mx)))).as("sxx"),
      sum(fold(zip_with(xs, ys, (x, y) => (x - mx) * (y - my)))).as("sxy"),
      sum(fold(transform(ys, y => (y - my) * (y - my)))).as("syy")).head
    val theta = 0.5 * math.atan2(2 * second.getDouble(1),
      second.getDouble(0) - second.getDouble(2))
    var c = math.cos(theta); var s = math.sin(theta)
    if (c < 0) { c = -c; s = -s } // sign-fix: PC1 points toward +x
    df
      .withColumn(s"${xsCol}_aligned",
        zip_with(xs, ys, (x, y) => (x - mx) * c + (y - my) * s))
      .withColumn(s"${ysCol}_aligned",
        zip_with(xs, ys, (x, y) => -(x - mx) * s + (y - my) * c))
  }
}
