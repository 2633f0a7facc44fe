package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C6 NumPy-parity fixtures: expected values computed with the reference's
  * own dist_pts_ellipse / _opencv_ellipse_to_dict arithmetic
  * (externals/methods.py:83-120, marker_detection.py:14-26). */
class EllipseGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("distToEllipse matches dist_pts_ellipse to the last ulp") {
    // ellipse center (3,2), full axes (4,2), rotated 30°
    val pts = Seq(
      (0, 5.0, 2.0, 0.48814210796309115),
      (1, 3.0, 4.0, 0.8905996075495418),
      (2, 0.0, 0.0, 1.61786301492474),
      (3, 3.0, 3.0, 0.10940039245045816))
    val df = pts.toDF("id", "px", "py", "expect")
    val out = df.withColumn("d", EllipseGeometry.distToEllipse(
        col("px"), col("py"), lit(3.0), lit(2.0), lit(4.0), lit(2.0), lit(30.0)))
      .select("id", "d", "expect").collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"point ${r.getInt(0)}")
    }
  }

  test("distToEllipse at the exact center is NaN (reference 0/0 parity)") {
    val d = Seq((3.0, 2.0)).toDF("px", "py")
      .select(EllipseGeometry.distToEllipse(col("px"), col("py"),
        lit(3.0), lit(2.0), lit(4.0), lit(2.0), lit(30.0)).as("d"))
      .collect()(0).getDouble(0)
    assert(d.isNaN)
  }

  test("opencvEllipse maps detector fields like _opencv_ellipse_to_dict") {
    val df = Seq((10.0, 20.0, 3.5, 5.0, 2.0))
      .toDF("cx", "cy", "minor_r", "major_r", "angle_rad")
    val out = EllipseGeometry.opencvEllipse(df,
      "cx", "cy", "minor_r", "major_r", "angle_rad").collect()(0)
    val ell = out.getAs[org.apache.spark.sql.Row]("ellipse")
    assert(ell.getAs[scala.collection.Seq[Double]]("center").toSeq == Seq(10.0, 20.0))
    assert(ell.getAs[scala.collection.Seq[Double]]("axes").toSeq == Seq(7.0, 10.0))
    assert(math.abs(ell.getAs[Double]("angle") - 24.591559026164646) < 1e-12)
    assert(out.getAs[Double]("diameter") == 10.0)
    assert(out.getAs[scala.collection.Seq[Double]]("location").toSeq == Seq(10.0, 20.0))
  }

  test("nearestEllipse assigns each point to its closest ellipse") {
    val ellipses = Seq(
      (0L, 0.0, 0.0, 2.0, 2.0, 0.0),   // circle r=1 at origin
      (1L, 10.0, 0.0, 4.0, 2.0, 0.0))  // ellipse at (10,0)
      .toDF("e_id", "ex", "ey", "dx", "dy", "angle")
    val points = Seq((0L, 1.5, 0.0), (1L, 9.0, 0.0), (2L, 5.0, 0.0))
      .toDF("p_id", "px", "py")
    val out = EllipseGeometry.nearestEllipse(points, ellipses, "p_id", "e_id")
      .select("p_id", "e_id", "dist").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L)._1 == 0L && math.abs(out(0L)._2 - 0.5) < 1e-12)
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - 1.0) < 1e-12)
    assert(out(2L)._1 == 1L) // 4 units to circle rim vs 3 to ellipse-1 rim
  }
}
