package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RoiMiscSpec extends SparkSpec {
  import spark.implicits._

  // planted target drifting across the frame; detector "sees" it only if
  // the search ROI contains it
  def target(i: Long): (Double, Double) = (100.0 + i * 2.0, 200.0 + i)
  def mkDetect(log: scala.collection.mutable.ArrayBuffer[Boolean])
      : (Long, RoiTracker.Roi) => Option[(Double, Double)] =
    (i, roi) => {
      val (tx, ty) = target(i)
      val full = roi.w >= 2048
      log += full
      if (tx >= roi.x && tx <= roi.x + roi.w && ty >= roi.y && ty <= roi.y + roi.h)
        Some((tx, ty))
      else None
    }

  test("ROI tracker follows the target with mostly ROI-sized searches (W11)") {
    val calls = scala.collection.mutable.ArrayBuffer[Boolean]()
    val out = RoiTracker.track((0L until 100L).iterator, mkDetect(calls),
      2048, 1536, pad = 50, fullFrameEvery = 30).toSeq
    // every frame detected (drift 2px/frame << 50px pad)
    assert(out.forall(_._2.isDefined))
    // most detections used the small ROI, periodic full-frame refresh
    val roiFrac = out.count(_._3).toDouble / out.length
    assert(roiFrac > 0.9)
    assert(calls.count(identity) < 10) // few full-frame searches
  }

  test("ROI miss falls back to full frame and recovers") {
    // target jumps by 500 px at frame 50 → ROI miss → full-frame recovery
    def jumpy(i: Long): (Double, Double) =
      if (i < 50) (100.0 + i, 200.0) else (900.0, 900.0)
    val det: (Long, RoiTracker.Roi) => Option[(Double, Double)] = (i, roi) => {
      val (tx, ty) = jumpy(i)
      if (tx >= roi.x && tx <= roi.x + roi.w && ty >= roi.y && ty <= roi.y + roi.h)
        Some((tx, ty)) else None
    }
    val out = RoiTracker.track((0L until 100L).iterator, det,
      2048, 1536, pad = 30, fullFrameEvery = 1000).toSeq
    assert(out.forall(_._2.isDefined)) // never loses the target for good
    assert(out(50)._3 == false || out(51)._3 == false) // full-frame around the jump
  }

  test("trackFrames distributes per session") {
    val det: (Long, RoiTracker.Roi) => Option[(Double, Double)] =
      (i, _) => Some((i.toDouble, i.toDouble))
    val df = (for (s <- Seq("a", "b"); i <- 0 until 20) yield (s, i.toLong))
      .toDF("session", "frame")
    val out = RoiTracker.trackFrames(df, "frame", Seq("session"), det,
      2048, 1536, 50)
    assert(out.count() == 40)
    assert(out.filter(col("det_x").isNull).count() == 0)
  }

  test("ArrayMean aggregates element-wise (A10)") {
    import graft.functions.ArrayMean
    val df = Seq(("g", Seq(1.0, 2.0, 3.0)), ("g", Seq(3.0, 4.0, 5.0)),
      ("h", Seq(10.0, 20.0, 30.0))).toDF("k", "v")
    val out = df.groupBy("k").agg(ArrayMean.arrayMean(col("v")).as("m"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq).toMap
    assert(out("g") == Seq(2.0, 3.0, 4.0))
    assert(out("h") == Seq(10.0, 20.0, 30.0))
  }

  test("GazeModelIO round-trips poly and tps artifacts") {
    import graft.model._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("models").toString
    val poly = PolyMapModel(Array(0.9, 0.1, 0.05, -0.02, 0.03, 0.01, 0.02),
      Array(-0.1, 1.1, 0.02, 0.06, -0.04, 0.02, -0.01), 7)
    GazeModelIO.save(spark, poly, s"$dir/poly")
    val backPoly = GazeModelIO.load(spark, s"$dir/poly").asInstanceOf[PolyMapModel]
    assert(backPoly.n == 7 && backPoly.cx.sameElements(poly.cx) &&
      backPoly.cy.sameElements(poly.cy))
    val anchors = Array.tabulate(6)(i => Array((i % 3) / 2.0, (i / 3) / 1.0))
    val tps = TpsMapModel(anchors, Tps.fit(anchors, anchors.map(_(0)), 1e-3),
      anchors, Tps.fit(anchors, anchors.map(_(1)), 1e-3))
    GazeModelIO.save(spark, tps, s"$dir/tps")
    val back = GazeModelIO.load(spark, s"$dir/tps").asInstanceOf[TpsMapModel]
    assert(back.thetaX.sameElements(tps.thetaX))
    assert(back.anchorsX.map(_.toSeq).toSeq == tps.anchorsX.map(_.toSeq).toSeq)
  }
}
