package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ErrorMapSpec extends SparkSpec {
  import spark.implicits._

  val rng = new scala.util.Random(11)

  // markers on a 4x4 grid; gaze = marker + constant pixel offset
  val offsetNorm = 0.01 // in normalized x units → 2048*0.01 ≈ 20.5 px
  lazy val (markers, gaze) = {
    val ms = scala.collection.mutable.ArrayBuffer[CalM]()
    val gs = scala.collection.mutable.ArrayBuffer[CalP]()
    var t = 0.0; var c = 0L
    for (i <- 0 until 4; j <- 0 until 4) {
      val mx = 0.15 + 0.2 * i; val my = 0.15 + 0.2 * j
      for (_ <- 0 until 10) {
        ms += CalM(t, mx, my, c)
        gs += CalP(t + 0.001, mx + offsetNorm, my, 0.95)
        t += 1.0 / 30.0
      }
      c += 1; t += 0.3
    }
    (ms.toSeq.toDF(), gs.toSeq.toDF())
  }

  test("constant-offset gaze yields the analytic angular error") {
    val cfg = ErrorMap.Config(resolution = (60, 80))
    val res = ErrorMap.compute(markers, gaze, cfg)
    val ppd = ErrorMap.pixelsPerDegree(cfg)
    val expectedDeg = offsetNorm * 2048.0 / ppd
    val pts = res.points.select("err_deg").collect().map(_.getDouble(0))
    assert(pts.length == 16)
    pts.foreach(e => assert(math.abs(e - expectedDeg) < 1e-9,
      s"point err $e vs $expectedDeg"))
    val sm = res.summary.collect()(0)
    assert(math.abs(sm.getAs[Double]("gaze_err_weighted") - expectedDeg) < 0.05)
    assert(sm.getAs[Double]("gaze_fraction_excluded") >= 0.0)
    // grid has full resolution and nulls outside the marker hull
    assert(res.grid.count() == 60L * 80L)
    assert(res.grid.filter(col("err").isNull).count() > 0)
    val inside = res.grid.filter(col("x").between(0.2, 0.7) &&
      col("y").between(0.2, 0.7) && col("err").isNotNull)
    inside.select("err").collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - expectedDeg) < 0.2)
    }
  }

  test("convex hull is correct and masks outside points") {
    val square = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(1.0, 1.0),
      Array(0.0, 1.0), Array(0.5, 0.5))
    val hull = ErrorMap.convexHull(square)
    assert(hull.length == 4)
    val df = Seq((0.5, 0.5), (1.5, 0.5), (-0.1, 0.2)).toDF("x", "y")
      .withColumn("in", ErrorMap.hullPredicate(square, col("x"), col("y"), false))
    assert(df.collect().map(_.getBoolean(2)).toSeq == Seq(true, false, false))
  }
}
