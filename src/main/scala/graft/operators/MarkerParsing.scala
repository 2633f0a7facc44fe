package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marker-parsing operators — the reference's detection-cleaning stage
  * (file:line relative to /root/reference/vedb_gaze/marker_parsing.py).
  *
  *  - snapTimestamps (J5): float-drift repair :83-102
  *  - removeBriefDetections (W3): dedup + presence-RLE + duration gate :53-111
  *  - sizeAspect (P5): marker size/aspect derivation :148-161
  *  - removeSmallDetections (P7): size/aspect/bimodality filter :114-184
  *  - filterAndCluster: the full A1→W3→P7→W2→A7→A3 composition
  *    (filter_and_cluster, :470-622 driver flow)
  *
  * All set-level steps are one-shuffle declarative transforms; only the
  * per-epoch DBSCAN (bounded groups) runs imperative local code.
  */
object MarkerParsing {

  /** J5: timestamps within `tol` (1e-8 s) of a reference-clock timestamp
    * snap to it exactly. Bucketed range join on floor(ts/tol) (the
    * windowAgg de-thetafication), then coalesce. */
  def snapTimestamps(df: DataFrame, clock: DataFrame, tsCol: String,
                     clockTs: String, tol: Double = 1e-8): DataFrame = {
    val d = df.withColumn("_b", floor(col(tsCol).cast("double") / tol).cast("long"))
    val c = clock.select(col(clockTs).cast("double").as("_ct"))
      .withColumn("_cb", floor(col("_ct") / tol).cast("long"))
      .withColumn("_b", explode(array(col("_cb") - 1, col("_cb"), col("_cb") + 1)))
      .drop("_cb")
    d.join(c, Seq("_b"), "left")
      .withColumn("_match",
        when(abs(col("_ct") - col(tsCol).cast("double")) < tol, col("_ct")))
      .groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(min(col("_match")).as("_snap"))
      .withColumn(tsCol, coalesce(col("_snap"), col(tsCol).cast("double")))
      .drop("_snap")
  }

  /** W3: drop duplicate-timestamp rows (all copies), snap float-drifted
    * timestamps onto the clock (the reference's 1e-8 in1d repair,
    * :83-102 — J5), then drop detection runs shorter than
    * `durationThreshold` seconds. A run = consecutive presence in the
    * reference clock (frame granularity): a marker row is kept iff its
    * RLE segment over the clock index lasts long enough. */
  def removeBriefDetections(markers: DataFrame, clock: DataFrame,
                            tsCol: String, clockTs: String,
                            durationThreshold: Double = 0.6,
                            keys: Seq[String] = Nil): DataFrame = {
    val deduped = snapTimestamps(
      TimeSeriesOps.dropDuplicateTimestamps(markers, tsCol, keys),
      clock, tsCol, clockTs)
    // mark clock rows by marker presence, RLE over the clock, gate, semi-join
    val present = deduped.select((keys.map(k => col(k).as(s"_p_$k")) :+
      col(tsCol).cast("double").as("_mt")): _*).distinct()
    val marked = clock.select((keys.map(col) :+
        col(clockTs).cast("double").as("_ct")): _*)
      .join(present,
        keys.foldLeft(col("_ct") === col("_mt")) { (c, k) =>
          c && col(k) === col(s"_p_$k")
        }, "left")
    val segs = TimeSeriesOps.rleSegments(
      marked, "_ct", col("_mt").isNotNull, keys)
      .filter(col("duration") > durationThreshold)
    val windows = segs.select((keys.map(k => col(k).as(s"_w_$k")) :+
      col("onset") :+ col("offset")): _*)
    val joinCond = keys.foldLeft(
      col(tsCol).cast("double") >= col("onset") &&
        col(tsCol).cast("double") <= col("offset")) { (c, k) =>
      c && col(k) === col(s"_w_$k")
    }
    deduped.join(broadcast(windows), joinCond, "left_semi")
  }

  /** P5: mean size + aspect ratio columns from a `size` array<double>[2]
    * (checkerboard variant takes the corner-extent ptp upstream). */
  def sizeAspect(df: DataFrame, sizeCol: String,
                 aspectType: String = "x/y"): DataFrame = {
    val sx = element_at(col(sizeCol), 1).cast("double")
    val sy = element_at(col(sizeCol), 2).cast("double")
    val aspect = aspectType match {
      case "x/y" => sx / sy
      case "max/min" => greatest(sx, sy) / least(sx, sy)
      case other => throw new IllegalArgumentException(other)
    }
    df.withColumn("marker_size", (sx + sy) / 2.0)
      .withColumn("marker_aspect", aspect)
  }

  /** P5 checkerboard variant: derive the `size` array from the
    * corner-extent ptp of the checkerboard corner grid, with the x extent
    * scaled by the image aspect ratio — norm_pos is 0-1 on both axes, so
    * marker aspect is wrong without the correction
    * (marker_parsing.py:150-156). Output feeds [[sizeAspect]] /
    * [[removeSmallDetections]] exactly like the circles path. */
  def checkerboardSize(df: DataFrame,
                       cornersCol: String = "norm_pos_full_checkerboard",
                       imageAspectRatio: Double = 4.0 / 3.0): DataFrame = {
    def axis(i: Int) = transform(col(cornersCol), c => element_at(c, i))
    def ptp(i: Int) = array_max(axis(i)) - array_min(axis(i))
    df.withColumn("size", array(ptp(1) * imageAspectRatio, ptp(2)))
  }

  /** P7: remove small/oblique detections — bimodality keep-larger-mode
    * (A6, driver-side 2-means on the collected size column), optional
    * median−k·std size floor, aspect-ratio gate (:114-184).
    *
    * All keep-masks are computed over the FULL marker set and intersected
    * (the reference ANDs the three masks, and median/std come from the
    * unfiltered sizes — marker_parsing.py:157-175), NOT applied
    * sequentially: with both thresholds set, a sequential composition
    * would compute the std floor over the already-bimodality-filtered
    * sizes and diverge.
    *
    * The bimodality mask is computed per `groupCols` group inside
    * `flatMapGroups` ([[ClusterOps.bimodalKeepFlag]]) — no driver collect;
    * `groupCols = Nil` is the reference's one-marker-table-per-session
    * case (one global group). */
  def removeSmallDetections(df: DataFrame, sizeCol: String,
                            sizeStdThreshold: Option[Double] = None,
                            bimodalStdThreshold: Option[Double] = Some(2.5),
                            aspectThreshold: Option[Double] = Some(1.2),
                            aspectType: String = "x/y",
                            keepLessThan: Boolean = true,
                            groupCols: Seq[String] = Nil): DataFrame = {
    // persisted (tracked): up to three consumers read this frame — the
    // bimodality cut fit, the join probe side, and the std-floor agg
    val withSz = graft.CacheRegistry.persistTracked(
      sizeAspect(df, sizeCol, aspectType))
    val sz = col("marker_size").cast("double")
    val (flagged, bimodalPred): (DataFrame, Option[Column]) =
      bimodalStdThreshold match {
        case Some(k) =>
          (ClusterOps.bimodalKeepFlag(withSz, groupCols, "marker_size", k),
            Some(col("_bimodal_keep")))
        case None => (withSz, None)
      }
    val stdPred: Option[Column] = sizeStdThreshold.map { k =>
      val r = withSz.agg(
        expr("percentile(marker_size, 0.5)"),
        // population std, numpy np.std semantics
        sqrt(avg(col("marker_size") * col("marker_size")) -
          avg(col("marker_size")) * avg(col("marker_size")))).first()
      sz > (r.getDouble(0) - r.getDouble(1) * k)
    }
    val aspectPred: Option[Column] = aspectThreshold.map { t =>
      if (keepLessThan) col("marker_aspect") < t else col("marker_aspect") > t
    }
    (bimodalPred.toSeq ++ stdPred ++ aspectPred).foldLeft(flagged)(_ filter _)
      .drop("_bimodal_keep")
  }

  /** The full marker-cleaning composition (filter_and_cluster):
    * A1 dedup + W3 brief-removal → P7 size filter → W2 epoch split
    * (gap > epochGap, duration gates) → A7 per-epoch DBSCAN over
    * (ts_norm + 2, x·aspect, y) features (:352-384) → A3 cluster gates.
    * Returns marker rows + epoch + marker_cluster_index. */
  def filterAndCluster(markers: DataFrame, clock: DataFrame,
                       tsCol: String = "timestamp",
                       clockTs: String = "timestamp",
                       sizeCol: String = "size",
                       imageAspect: Double = 4.0 / 3.0,
                       epochGap: Double = 15.0,
                       epochDuration: (Double, Double) = (30.0, 150.0),
                       dbscanEps: Double = 0.05,
                       dbscanMinPoints: Int = 5,
                       clusterDuration: (Double, Double) = (0.2, 5.0),
                       minClusters: Int = 1,
                       assumedEpochTime: Double = 90.0): DataFrame = {
    val cleaned = removeSmallDetections(
      removeBriefDetections(markers, clock, tsCol, clockTs), sizeCol)
    val epoched = TimeSeriesOps.sessionDurationFilter(
      TimeSeriesOps.sessionize(cleaned, tsCol, Nil, epochGap, "epoch"),
      tsCol, Nil, "epoch", epochDuration._1, epochDuration._2)
    // per-epoch normalized features (marker_parsing.py:366-378): t scaled
    // by the CONSTANT assumed epoch time of 90 s (the reference explicitly
    // comments out ptp so cluster spacing is consistent across epochs),
    // offset +2; x scaled by image aspect, y raw
    val w = Window.partitionBy(col("epoch"))
    val t = col(tsCol).cast("double")
    val tn = (t - min(t).over(w)) / assumedEpochTime + 2.0
    val feat = epoched
      .withColumn("_ft", tn)
      .withColumn("_fx", element_at(col("norm_pos"), 1) * imageAspect)
      .withColumn("_fy", element_at(col("norm_pos"), 2))
    val clustered = ClusterOps.dbscan(feat, Seq("epoch"),
      Seq("_ft", "_fx", "_fy"), tsCol, dbscanEps, dbscanMinPoints,
      "marker_cluster_index")
      .drop("_ft", "_fx", "_fy")
      // labels restart at 0 per epoch (the reference clusters each epoch
      // file separately) — make them globally unique before the gate,
      // keeping -1 = noise
      .withColumn("marker_cluster_index",
        when(col("marker_cluster_index") === -1, -1L)
          .otherwise(col("epoch") * 100000 + col("marker_cluster_index")))
    ClusterOps.clusterGate(clustered, "marker_cluster_index", tsCol,
      clusterDuration._1, clusterDuration._2, minClusters = minClusters)
  }

  /** [[filterAndCluster]] for CHECKERBOARD detections
    * (schemas.Schemas.markerCheckerboard): the reference derives the size
    * pair from the corner-grid ptp (x scaled by the image aspect) when
    * the marker table has `norm_pos_full_checkerboard` instead of `size`
    * (remove_small_detections, marker_parsing.py:148-156; detection rows
    * from find_checkerboard_frame, marker_detection.py:243-258). Every
    * downstream step — brief-removal, P7 masks, epoch split, DBSCAN,
    * cluster gates — is identical to the circles path; the corner arrays
    * ride along into the clustered output. */
  def filterAndClusterCheckerboard(markers: DataFrame, clock: DataFrame,
                                   tsCol: String = "timestamp",
                                   clockTs: String = "timestamp",
                                   cornersCol: String = "norm_pos_full_checkerboard",
                                   imageAspect: Double = 4.0 / 3.0,
                                   epochGap: Double = 15.0,
                                   epochDuration: (Double, Double) = (30.0, 150.0),
                                   dbscanEps: Double = 0.05,
                                   dbscanMinPoints: Int = 5,
                                   clusterDuration: (Double, Double) = (0.2, 5.0),
                                   minClusters: Int = 1): DataFrame =
    filterAndCluster(
      checkerboardSize(markers, cornersCol, imageAspect), clock,
      tsCol, clockTs, sizeCol = "size", imageAspect = imageAspect,
      epochGap = epochGap, epochDuration = epochDuration,
      dbscanEps = dbscanEps, dbscanMinPoints = dbscanMinPoints,
      clusterDuration = clusterDuration, minClusters = minClusters)
}
