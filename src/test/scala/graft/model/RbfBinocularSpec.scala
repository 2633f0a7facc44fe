package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RbfBinocularSpec extends SparkSpec {
  import spark.implicits._

  val rng = new scala.util.Random(17)
  val anchors: Array[Array[Double]] =
    Array.tabulate(16)(i => Array((i % 4) / 3.0, (i / 4) / 3.0))

  test("RBF interpolates anchors near-exactly at smooth=0") {
    val f = (x: Double, y: Double) => 0.4 * x - 0.2 * y + 0.1 * x * y
    val v = anchors.map(a => f(a(0), a(1)))
    for (k <- Seq("multiquadric", "linear", "cubic", "thin_plate")) {
      val m = Rbf.fit(anchors, v, k, 0.0)
      anchors.zip(v).foreach { case (a, e) =>
        assert(math.abs(m.predict(a(0), a(1)) - e) < 1e-6, s"kernel $k")
      }
    }
  }

  test("RBF LOO-CV selects a sensible grid point") {
    val f = (x: Double, y: Double) => math.sin(3 * x) + y * y
    val v = anchors.map(a => f(a(0), a(1)))
    val vy = anchors.map(a => f(a(1), a(0)))
    val (k, s, errs) = Rbf.looSelect(anchors, v, vy,
      Seq("multiquadric", "thin_plate"), Seq(0.0, 1.0))
    assert(errs.length == 4)
    assert(Seq("multiquadric", "thin_plate").contains(k))
    assert(errs.min == errs(Seq("multiquadric", "thin_plate").indexOf(k) * 2 +
      Seq(0.0, 1.0).indexOf(s)))
  }

  test("RbfMapModel Column apply matches driver predict") {
    val v = anchors.map(a => a(0) * 0.7 + a(1) * 0.2)
    val m = RbfMapModel(
      Rbf.fit(anchors, v, "multiquadric", 0.0),
      Rbf.fit(anchors, v, "thin_plate", 0.0))
    val df = Seq((0.21, 0.47), (0.8, 0.13)).toDF("px", "py")
    val (gx, gy) = m.mapCols(col("px"), col("py"))
    df.select(col("px"), col("py"), gx.as("gx"), gy.as("gy")).collect()
      .foreach { r =>
        assert(math.abs(r.getDouble(2) - m.fx.predict(r.getDouble(0), r.getDouble(1))) < 1e-9)
        assert(math.abs(r.getDouble(3) - m.fy.predict(r.getDouble(0), r.getDouble(1))) < 1e-9)
      }
  }

  test("binocular_pl: triple-matched fit recovers a planted joint map") {
    // markers on a grid; eye0/eye1 = two different affine views of the marker
    val rows = (0 until 6).flatMap { i =>
      (0 until 6).map { j =>
        val t = (i * 6 + j) * 0.1
        val mx = 0.1 + 0.16 * i; val my = 0.1 + 0.16 * j
        (t, mx, my,
          0.8 * mx + 0.05 + rng.nextGaussian() * 1e-4, // eye0 x
          0.9 * my + 0.02 + rng.nextGaussian() * 1e-4, // eye0 y
          0.7 * mx + 0.10 + rng.nextGaussian() * 1e-4, // eye1 x
          0.85 * my + 0.03 + rng.nextGaussian() * 1e-4) // eye1 y
      }
    }
    val markers = rows.map(r => (r._1, r._2, r._3)).toDF("timestamp", "norm_x", "norm_y")
    val p0 = rows.map(r => (r._1 + 0.001, r._4, r._5, 0.95))
      .toDF("timestamp", "norm_x", "norm_y", "confidence")
    val p1 = rows.map(r => (r._1 + 0.002, r._6, r._7, 0.95))
      .toDF("timestamp", "norm_x", "norm_y", "confidence")
    val models = Calibrator.fitBinocular(markers, p0, p1).get
    // joint map applied to the (eye0, eye1) inputs must recover the marker
    val (gx, gy) = models.bino.mapCols(col("x0"), col("y0"), col("x1"), col("y1"))
    val test = rows.map(r => (r._4, r._5, r._6, r._7, r._2, r._3))
      .toDF("x0", "y0", "x1", "y1", "mx", "my")
      .select(gx.as("gx"), gy.as("gy"), col("mx"), col("my")).collect()
    test.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 0.01)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 0.01)
    }
    // per-eye fallbacks work alone too
    val (ex, ey) = models.eye0.mapCols(col("x0"), col("y0"))
    val t2 = rows.map(r => (r._4, r._5, r._2, r._3)).toDF("x0", "y0", "mx", "my")
      .select(ex.as("gx"), ey.as("gy"), col("mx"), col("my")).collect()
    t2.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 0.01)
    }
  }

  test("monocular_rbf_cv dispatch produces a working model") {
    val pxy = Array.tabulate(12)(i => Array((i % 4) / 3.0, (i / 4) / 2.0))
    val mx = pxy.map(a => 0.9 * a(0) + 0.05)
    val my = pxy.map(a => 0.85 * a(1) + 0.03)
    val model = Calibrator.fitPoints(pxy, mx, my,
      Calibrator.Config(calibrationType = "monocular_rbf_cv")).get
    val df = pxy.map(a => (a(0), a(1))).toSeq.toDF("px", "py")
    val (gx, _) = model.mapCols(col("px"), col("py"))
    df.select(col("px"), gx.as("gx")).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - (0.9 * r.getDouble(0) + 0.05)) < 0.05)
    }
  }
}
