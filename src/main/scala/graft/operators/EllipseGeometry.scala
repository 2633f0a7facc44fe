package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C6: ellipse geometry kernels from the detection path — pure math, no
  * OpenCV dependency, evaluated row-parallel as codegen'd Column
  * arithmetic.
  *
  * Reference:
  *  - distToEllipse: `dist_pts_ellipse`
  *    /root/reference/vedb_gaze/externals/methods.py:83-120 — used by the
  *    concentric-circle detector to score candidate points against every
  *    fitted ellipse;
  *  - opencvEllipse: `_opencv_ellipse_to_dict`
  *    /root/reference/vedb_gaze/marker_detection.py:14-26 — the
  *    pupil-detector ellipse → detection-row field mapping.
  */
object EllipseGeometry {

  /** Unsigned euclidean distance of point (px, py) to the ellipse with
    * center (ex, ey), FULL axes (dx, dy) and rotation `angleDeg` degrees
    * (numpy parity incl. the NaN at the exact center, where the reference's
    * 0/0 ratio is NaN too).
    *
    * Steps mirror the reference: translate to the origin, rotate by the
    * row-vector convention ([x, y]·R: x' = x·cosθ + y·sinθ,
    * y' = −x·sinθ + y·cosθ), normalize by the radii, then scale the unit
    * residual back to image space. */
  def distToEllipse(px: Column, py: Column, ex: Column, ey: Column,
                    dx: Column, dy: Column, angleDeg: Column): Column = {
    val rx = dx / 2.0
    val ry = dy / 2.0
    val a = angleDeg / 180.0 * math.Pi
    val tx = px - ex
    val ty = py - ey
    val rxp = tx * cos(a) + ty * sin(a)
    val ryp = -tx * sin(a) + ty * cos(a)
    val nx = rxp / rx
    val ny = ryp / ry
    val normMag = sqrt(nx * nx + ny * ny)
    // numpy's 0/0 at the exact center is NaN; ANSI Spark would throw on
    // the zero divisor, so the degenerate case is made explicit
    val ratio = when(normMag === 0.0, lit(Double.NaN))
      .otherwise(abs(normMag - 1.0) / normMag)
    val sx = nx * ratio * rx
    val sy = ny * ratio * ry
    sqrt(sx * sx + sy * sy)
  }

  /** The pupil-detector ellipse → detection-row mapping: axes = radii
    * doubled (minor first), angle radians → degrees − 90, diameter = major
    * axis, location = center. Appends `ellipse` (struct<center, axes,
    * angle>), `diameter`, `location` — the marker/pupil schema fields. */
  def opencvEllipse(df: DataFrame, cxCol: String, cyCol: String,
                    minorRadiusCol: String, majorRadiusCol: String,
                    angleRadCol: String): DataFrame = {
    val axes = array(col(minorRadiusCol).cast("double") * 2.0,
      col(majorRadiusCol).cast("double") * 2.0)
    val center = array(col(cxCol).cast("double"), col(cyCol).cast("double"))
    df.withColumn("ellipse", struct(
        center.as("center"), axes.as("axes"),
        (col(angleRadCol).cast("double") * (180.0 / math.Pi) - 90.0).as("angle")))
      .withColumn("diameter",
        greatest(col("ellipse.axes")(0), col("ellipse.axes")(1)))
      .withColumn("location", col("ellipse.center"))
  }

  /** Assign each point its nearest ellipse: the candidate-scoring step of
    * the circle detector, distributed as a broadcast of the (small)
    * ellipse table against the point cloud.
    *
    * `points` needs (pointId, pxCol, pyCol); `ellipses` needs (ellipseId,
    * exCol, eyCol, dxCol, dyCol, angleCol) — all names parameterized. */
  def nearestEllipse(points: DataFrame, ellipses: DataFrame,
                     pointId: String, ellipseId: String,
                     pxCol: String = "px", pyCol: String = "py",
                     exCol: String = "ex", eyCol: String = "ey",
                     dxCol: String = "dx", dyCol: String = "dy",
                     angleCol: String = "angle"): DataFrame = {
    val d = distToEllipse(col(pxCol), col(pyCol), col(exCol), col(eyCol),
      col(dxCol), col(dyCol), col(angleCol))
    points.crossJoin(broadcast(ellipses))
      .withColumn("dist", d)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(pointId))
          .orderBy(col("dist"), col(ellipseId))))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
