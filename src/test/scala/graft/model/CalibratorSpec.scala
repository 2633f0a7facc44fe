package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

// encoders need top-level case classes (no outer-instance capture)
case class CalM(timestamp: Double, norm_x: Double, norm_y: Double,
                marker_cluster_index: Long)
case class CalP(timestamp: Double, norm_x: Double, norm_y: Double,
                confidence: Double)

/** End-to-end synthetic session: markers on a grid with clustered repeats,
  * pupils = known smooth map of marker positions + jitter; the fitted model
  * must map pupils back to marker positions (SURVEY §5.2 golden test). */
class CalibratorSpec extends SparkSpec {
  import spark.implicits._

  val rng = new scala.util.Random(3)

  // true pupil→gaze map (what calibration must recover, roughly affine+warp)
  def trueGaze(px: Double, py: Double): (Double, Double) =
    (0.8 * px + 0.1 * py + 0.05, 0.9 * py - 0.05 * px + 0.03)
  // inverse direction used for data gen: marker → pupil (invertible affine)
  def pupilFor(mx: Double, my: Double): (Double, Double) = {
    // solve the 2x2 system for (px,py) given trueGaze(px,py)=(mx,my)
    val (a, b, c) = (0.8, 0.1, 0.05)
    val (d, e, f) = (-0.05, 0.9, 0.03)
    val det = a * e - b * d
    val px = ((mx - c) * e - b * (my - f)) / det
    val py = (a * (my - f) - (mx - c) * d) / det
    (px, py)
  }

  // 5x5 marker grid, each "cluster" dwelled on for 20 frames at 30 Hz
  lazy val (markerDf, pupilDf) = {
    val ms = scala.collection.mutable.ArrayBuffer[CalM]()
    val ps = scala.collection.mutable.ArrayBuffer[CalP]()
    var t = 0.0
    var cluster = 0L
    for (i <- 0 until 5; j <- 0 until 5) {
      val mx = 0.1 + 0.2 * i; val my = 0.1 + 0.2 * j
      for (_ <- 0 until 20) {
        ms += CalM(t, mx + rng.nextGaussian() * 1e-3,
          my + rng.nextGaussian() * 1e-3, cluster)
        // pupil samples at 4x rate around each marker frame
        for (k <- 0 until 4) {
          val (px, py) = pupilFor(mx, my)
          ps += CalP(t + (k - 1.5) * 0.008, px + rng.nextGaussian() * 5e-4,
            py + rng.nextGaussian() * 5e-4, 0.9 + rng.nextDouble() * 0.1)
        }
        t += 1.0 / 30.0
      }
      cluster += 1
      t += 0.5
    }
    (ms.toSeq.toDF(), ps.toSeq.toDF())
  }

  test("monocular_tps_cv fit maps pupils to gaze within tolerance") {
    val model = Calibrator.fit(markerDf, pupilDf,
      Calibrator.Config(calibrationType = "monocular_tps_cv")).get
    val gaze = model.transform(pupilDf)
    assert(gaze.columns.toSet == Set("timestamp", "confidence", "gaze_x", "gaze_y"))
    // compare mapped gaze vs the true map of each pupil position
    val rows = model.transform(
        pupilDf.withColumn("tx", col("norm_x")).withColumn("ty", col("norm_y")))
      .collect()
    val check = pupilDf.collect().zip(gaze.collect())
    check.take(500).foreach { case (p, g) =>
      val (ex, ey) = trueGaze(p.getAs[Double]("norm_x"), p.getAs[Double]("norm_y"))
      assert(math.abs(g.getAs[Double]("gaze_x") - ex) < 0.01)
      assert(math.abs(g.getAs[Double]("gaze_y") - ey) < 0.01)
    }
  }

  test("monocular_pl (two-pass poly) also recovers the map") {
    val model = Calibrator.fit(markerDf, pupilDf,
      Calibrator.Config(calibrationType = "monocular_pl")).get
    val gaze = model.transform(pupilDf).collect()
    pupilDf.collect().zip(gaze).take(200).foreach { case (p, g) =>
      val (ex, ey) = trueGaze(p.getAs[Double]("norm_x"), p.getAs[Double]("norm_y"))
      assert(math.abs(g.getAs[Double]("gaze_x") - ex) < 0.01)
      assert(math.abs(g.getAs[Double]("gaze_y") - ey) < 0.01)
    }
  }

  test("tps Column expression matches driver-side Tps.z exactly") {
    val anchors = Array.tabulate(9)(i => Array((i % 3) / 2.0, (i / 3) / 2.0))
    val vals = anchors.map(a => a(0) * 0.7 + math.sin(a(1)))
    val theta = Tps.fit(anchors, vals, 1e-3)
    val pts = Seq((0.15, 0.35), (0.5, 0.5), (0.9, 0.1))
    val df = pts.toDF("px", "py")
      .withColumn("z", TpsMapModel.tpsCol(col("px"), col("py"), anchors, theta))
    df.collect().foreach { r =>
      val expected = Tps.z(r.getDouble(0), r.getDouble(1), anchors, theta)
      assert(math.abs(r.getDouble(2) - expected) < 1e-12)
    }
  }
}
