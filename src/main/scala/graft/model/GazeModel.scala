package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted gaze-mapping artifacts (M4/M8 apply side).
  *
  * Fits happen on the driver over reduced points (tens-to-hundreds); the
  * APPLY is the 100 TB-scale operation and is expressed as pure Column
  * arithmetic — whole-stage-codegen'd, no UDF, broadcast-free (the model is
  * folded into the plan as literals).
  *
  * Reference: make_map_function externals/calibrate_2d.py:250-409 (poly),
  * _map_tps / map_xy_tps calibration.py:329-344, 628-633 (TPS).
  */
trait GazeModel { // open: RbfMapModel and future mappers extend it
  /** (gazeX, gazeY) column expressions from normalized pupil coords. */
  def mapCols(px: Column, py: Column): (Column, Column)

  /** M10 gaze-mapping stage: pupil table → gaze table (timestamp,
    * norm_x/norm_y mapped, confidence carried when present). */
  def transform(pupils: DataFrame, pxCol: String = "norm_x",
                pyCol: String = "norm_y"): DataFrame = {
    val (gx, gy) = mapCols(col(pxCol), col(pyCol))
    val base = pupils.withColumn("gaze_x", gx).withColumn("gaze_y", gy)
    val keep = Seq("timestamp", "confidence", "id").filter(pupils.columns.contains)
    base.select((keep.map(col) ++ Seq(col("gaze_x"), col("gaze_y"))): _*)
  }
}

/** M1: the monomial feature expansion as Column expressions — the
  * distributed twin of [[Poly.features]] (same monomial sets and order,
  * externals/calibrate_2d.py:89-247), shared by the poly map models and
  * directly queryable (a design-matrix build over 10¹² rows is a plain
  * projection). */
object PolyFeatures {
  /** Monocular n ∈ {3,7,9}. */
  def cols(px: Column, py: Column, n: Int): Seq[Column] = n match {
    case 3 => Seq(px, py, lit(1.0))
    case 7 => Seq(px, py, px * px, py * py, px * py, px * px * py * py, lit(1.0))
    case 9 => Seq(px, py, px * px, py * py, px * py, px * px * py * py,
      px * px * py, py * py * px, lit(1.0))
    case _ => throw new IllegalArgumentException(
      s"monocular poly features need n in {3,7,9}, got $n")
  }

  /** Binocular n ∈ {5,13,17}. */
  def colsBinocular(x0: Column, y0: Column, x1: Column, y1: Column,
                    n: Int): Seq[Column] = n match {
    case 5 => Seq(x0, y0, x1, y1, lit(1.0))
    case 13 => Seq(x0, y0, x1, y1, x0 * x0, y0 * y0, x0 * y0, x0 * x0 * y0 * y0,
      x1 * x1, y1 * y1, x1 * y1, x1 * x1 * y1 * y1, lit(1.0))
    case 17 => Seq(x0, y0, x1, y1, x0 * x0, y0 * y0, x0 * y0, x0 * x0 * y0 * y0,
      x1 * x1, y1 * y1, x1 * y1, x1 * x1 * y1 * y1,
      x0 * x1, x0 * y1, y0 * x1, y0 * y1, lit(1.0))
    case _ => throw new IllegalArgumentException(
      s"binocular poly features need n in {5,13,17}, got $n")
  }
}

/** Monocular/one-eye polynomial map: gaze = Σ c_i · monomial_i(px, py). */
case class PolyMapModel(cx: Array[Double], cy: Array[Double], n: Int) extends GazeModel {
  require(Set(3, 7, 9).contains(n), s"monocular poly map needs n in {3,7,9}, got $n")

  def mapCols(px: Column, py: Column): (Column, Column) = {
    val ts = PolyFeatures.cols(px, py, n)
    (ts.zip(cx).map { case (t, c) => t * lit(c) }.reduce(_ + _),
     ts.zip(cy).map { case (t, c) => t * lit(c) }.reduce(_ + _))
  }
}

/** Binocular polynomial map over (px0, py0, px1, py1), n ∈ {5,13,17}. */
case class PolyBinocularModel(cx: Array[Double], cy: Array[Double], n: Int) {
  require(Set(5, 13, 17).contains(n))

  def mapCols(x0: Column, y0: Column, x1: Column, y1: Column): (Column, Column) = {
    val ts = PolyFeatures.colsBinocular(x0, y0, x1, y1, n)
    (ts.zip(cx).map { case (t, c) => t * lit(c) }.reduce(_ + _),
     ts.zip(cy).map { case (t, c) => t * lit(c) }.reduce(_ + _))
  }
}

/** TPS map: anchors (n×2) + θ per output axis, evaluated by the native
  * [[graft.functions.TpsEval]] flat loop — O(n_anchors) per row with
  * n_anchors ≤ ~10², one expression eval per row. */
case class TpsMapModel(anchorsX: Array[Array[Double]], thetaX: Array[Double],
                       anchorsY: Array[Array[Double]], thetaY: Array[Double])
    extends GazeModel {

  def mapCols(px: Column, py: Column): (Column, Column) =
    (TpsMapModel.tpsCol(px, py, anchorsX, thetaX),
     TpsMapModel.tpsCol(px, py, anchorsY, thetaY))
}

object TpsMapModel {
  /** Σ_i w_i·U(‖p−anchor_i‖) + a0 + ax·px + ay·py as a Column expression.
    * U(r) = r²·ln(r+1e-6), matching [[Tps.kernel]]. */
  def tpsCol(px: Column, py: Column, anchors: Array[Array[Double]],
             theta: Array[Double]): Column =
    tpsColFromColumns(px, py,
      typedLit(anchors.map(_(0)).toSeq), typedLit(anchors.map(_(1)).toSeq),
      typedLit(theta.toSeq))

  /** Data-driven TPS apply: anchors/θ come from COLUMNS (a model table
    * row joined onto the data), not literals — the multi-session shape
    * where thousands of fitted models fan out over their sessions via a
    * broadcast join. `axCol`/`ayCol`: array<double> anchor coords;
    * `thetaCol`: array<double> of length n+3. */
  def tpsColFromColumns(px: Column, py: Column, axCol: Column, ayCol: Column,
                        thetaCol: Column): Column =
    // native flat-loop evaluation (one eval per row instead of an
    // interpreted HOF lambda per anchor); op order identical to the
    // previous aggregate/element_at formulation — bit-equal results
    graft.functions.TpsEval.tps_eval(px, py, axCol, ayCol, thetaCol)
}
