package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-session calibration fan-out — the 100 TB shape (and the
  * reference's pipeline_mri layout, pipelines.py:826-1041: one fitted
  * model reused across many runs/epochs).
  *
  * The corpus axis is sessions: cluster reduction runs distributed and
  * GROUPED BY SESSION (one shuffle); only the reduced points (10¹-10²
  * rows × sessions) come to the driver, where each session's TPS is
  * fitted independently (embarrassingly parallel — a .par loop here, a
  * job-per-partition on a real cluster when sessions number 10⁶). The
  * fitted models become a MODEL TABLE (session, anchors_x, anchors_y,
  * theta_x, theta_y) that broadcast-joins onto the full pupil stream and
  * evaluates via the data-driven TPS columns — a single map stage over
  * 10¹² rows, no per-session literals, no driver round-trips.
  */
object SessionCalibrator {

  /** Distributed cluster-median reduction per session: markers/pupils
    * matched within each session by the J1 windowed as-of join, reduced
    * to one (pupil, marker) pair per (session, cluster). */
  def reducedPoints(markers: DataFrame, pupils: DataFrame,
                    sessionCol: String, window: Double,
                    minConfidence: Double): DataFrame = {
    import graft.operators.AsOfJoin
    val matched = AsOfJoin.windowAgg(
      markers.select(col(sessionCol), col("timestamp"), col("norm_x"),
        col("norm_y"), col("marker_cluster_index")),
      pupils.select(col(sessionCol), col("timestamp"),
        col("norm_x"), col("norm_y"), col("confidence")),
      "timestamp", "timestamp", Seq(sessionCol), window, Seq(
        expr("percentile(r_norm_x, 0.5)").as("px"),
        expr("percentile(r_norm_y, 0.5)").as("py"),
        expr("percentile(r_confidence, 0.5)").as("p_conf")))
      .filter(col("p_conf") > minConfidence)
    matched.groupBy(col(sessionCol), col("marker_cluster_index")).agg(
      expr("percentile(norm_x, 0.5)").as("mx"),
      expr("percentile(norm_y, 0.5)").as("my"),
      expr("percentile(px, 0.5)").as("px"),
      expr("percentile(py, 0.5)").as("py"))
  }

  /** Fit one TPS-CV model per session over the reduced points; returns
    * the model table. Sessions with < minPoints reduced clusters are
    * dropped (the reference's too-few-clusters None gate). */
  def fitModels(spark: SparkSession, reduced: DataFrame, sessionCol: String,
                cfg: Calibrator.Config = Calibrator.Config(),
                minPoints: Int = 4): DataFrame = {
    import spark.implicits._
    val bySession = reduced
      .select(col(sessionCol).cast("string"), col("px"), col("py"),
        col("mx"), col("my"))
      .collect()
      .groupBy(_.getString(0))
    // sequential driver loop (scala-parallel-collections is not on the
    // classpath); per-session fits are independent — at 10⁶ sessions run
    // this as a job over reduced-points partitions instead
    val rows = bySession.toSeq.sortBy(_._1).flatMap { case (session, rs) =>
      if (rs.length < minPoints) None
      else {
        val pxy = rs.map(r => Array(r.getDouble(1), r.getDouble(2)))
        val mx = rs.map(_.getDouble(3))
        val my = rs.map(_.getDouble(4))
        val m = Calibrator.fitTpsCv(pxy, mx, my, cfg.lambdas,
          cfg.maxStdsForOutliers)
        Some((session,
          m.anchorsX.map(_(0)).toSeq, m.anchorsX.map(_(1)).toSeq,
          m.thetaX.toSeq, m.thetaY.toSeq))
      }
    }
    rows.toDF(sessionCol, "ax", "ay", "theta_x", "theta_y")
  }

  /** Apply the model table to the full pupil stream: broadcast join by
    * session + data-driven TPS evaluation. Pupils of sessions without a
    * model are dropped (inner join), mirroring the reference's
    * failed-calibration short-circuit. */
  def transform(pupils: DataFrame, models: DataFrame,
                sessionCol: String): DataFrame = {
    val joined = pupils.join(broadcast(models), Seq(sessionCol))
    val gx = TpsMapModel.tpsColFromColumns(col("norm_x"), col("norm_y"),
      col("ax"), col("ay"), col("theta_x"))
    val gy = TpsMapModel.tpsColFromColumns(col("norm_x"), col("norm_y"),
      col("ax"), col("ay"), col("theta_y"))
    joined.select(col(sessionCol), col("timestamp"), gx.as("gaze_x"),
      gy.as("gaze_y"), col("confidence"))
  }

  /** The full fan-out: reduce → fit per session → apply. */
  def fitTransform(markers: DataFrame, pupils: DataFrame, sessionCol: String,
                   window: Double = 1.0 / 60.0,
                   cfg: Calibrator.Config = Calibrator.Config()): DataFrame = {
    val spark = markers.sparkSession
    val reduced = reducedPoints(markers, pupils, sessionCol, window,
      cfg.minConfidence)
    val models = fitModels(spark, reduced, sessionCol, cfg)
    transform(pupils, models, sessionCol)
  }
}
