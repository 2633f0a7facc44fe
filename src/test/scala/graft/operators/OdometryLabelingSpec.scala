package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OdometryLabelingSpec extends SparkSpec {
  import spark.implicits._

  test("quatToEuler: identity quaternion → all-zero angles") {
    val df = Seq((1.0, 0.0, 0.0, 0.0)).toDF("w", "x", "y", "z")
    val (p, r, y) = OdometryOps.quatToEuler(col("w"), col("x"), col("y"), col("z"))
    val row = df.select(p.as("p"), r.as("r"), y.as("y2")).collect()(0)
    assert(math.abs(row.getDouble(0)) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
    assert(math.abs(row.getDouble(2)) < 1e-12)
  }

  test("quatToEuler matches the reference formula numerically") {
    // quaternion for 90° about z-axis: w=cos(45°), z=sin(45°)
    val s2 = math.sqrt(2) / 2
    val df = Seq((s2, 0.0, 0.0, s2)).toDF("w", "x", "y", "z")
    val (p, r, yw) = OdometryOps.quatToEuler(col("w"), col("x"), col("y"), col("z"))
    val row = df.select(p.as("a"), r.as("b"), yw.as("c")).collect()(0)
    // after the RealSense remap: x'=-z, y'=x=0, z'=-y=0 → pitch=-asin(2·0)=0,
    // roll=atan2(2w·x', w²-x'²)=atan2(-2·s2·s2, 0)=-90°, yaw=atan2(0, w²+x'²)=0
    assert(math.abs(row.getDouble(0) - 0.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - (-90.0)) < 1e-9)
    assert(math.abs(row.getDouble(2) - 0.0) < 1e-9)
  }

  test("savgol reproduces a quadratic exactly in the interior") {
    val df = Seq.tabulate(21)(i => (i.toDouble, 2.0 + 0.5 * i - 0.1 * i * i))
      .toDF("t", "v")
    val out = OdometryOps.savgol(df, "t", "v", Nil, 7, 2, "sm")
      .orderBy("t").collect()
    out.drop(3).dropRight(3).foreach { r =>
      assert(math.abs(r.getAs[Double]("sm") - r.getAs[Double]("v")) < 1e-9)
    }
    // edges are null (documented behavior)
    assert(out(0).isNullAt(2) && out(20).isNullAt(2))
  }

  test("savgol smooths noise (variance reduction)") {
    val rng = new scala.util.Random(13)
    val df = Seq.tabulate(200)(i =>
      (i.toDouble, math.sin(i / 20.0) + rng.nextGaussian() * 0.2))
      .toDF("t", "v")
    val out = OdometryOps.savgol(df, "t", "v", Nil, 11, 2, "sm")
      .filter(col("sm").isNotNull).collect()
    val res = out.map(r => r.getAs[Double]("sm") - math.sin(r.getAs[Double]("t") / 20.0))
    val raw = out.map(r => r.getAs[Double]("v") - math.sin(r.getAs[Double]("t") / 20.0))
    def ms(a: Array[Double]) = a.map(x => x * x).sum / a.length
    assert(ms(res) < ms(raw) / 2)
  }

  test("blink FSM detects the planted blink (labeling.py:310-371)") {
    val dist = Array.fill(10)(1.4) ++
      Array(1.15, 0.9, 0.65, 0.4, 0.15, 0.15) ++
      Array(0.35, 0.55, 0.75, 0.95, 1.15, 1.35, 1.4) ++ Array.fill(10)(1.4)
    val segs = LabelingOps.blinkFsm(dist, fps = 120.0, negVel = -0.15, posVel = 0.15)
    assert(segs == Seq((10, 20)))
  }

  test("blinkSegments end-to-end over grouped series") {
    val dist = Array.fill(10)(1.4) ++
      Array(1.15, 0.9, 0.65, 0.4, 0.15, 0.15) ++
      Array(0.35, 0.55, 0.75, 0.95, 1.15, 1.35, 1.4) ++ Array.fill(10)(1.4)
    val rows = for {
      eye <- Seq(0, 1)
      (d, i) <- dist.zipWithIndex
    } yield (eye, i / 120.0, d)
    val df = rows.toDF("eye", "t", "d")
    val out = LabelingOps.blinkSegments(df, "t", "d", Seq("eye"),
        negVel = -0.15, posVel = 0.15)
      .orderBy("eye").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("onset") - 10 / 120.0) < 1e-9)
      // half-open [s, e): reference labels frames 10..19 → 10 frames
      assert(r.getAs[Long]("n_frames") == 10L)
    }
  }

  test("saccadeSegments: threshold + RLE + min-frame drop") {
    // velocity spike of 3 frames over threshold, one single-frame spike
    val vel = Array.fill(10)(5.0) ++ Array(120.0, 150.0, 130.0) ++
      Array.fill(5)(5.0) ++ Array(200.0) ++ Array.fill(5)(5.0)
    val df = vel.zipWithIndex.map { case (v, i) => (i / 120.0, v) }
      .toSeq.toDF("t", "vel")
    val out = LabelingOps.saccadeSegments(df, "t", "vel", Nil)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_rows") == 3L)
  }

  test("pcaAlign rotates keypoints onto the principal axis (M12)") {
    // keypoints along a 30-degree line: aligned x should carry the spread,
    // aligned y should be ~flat
    val a = math.toRadians(30)
    val rows = Seq.tabulate(50) { i =>
      val t = (i - 25) / 10.0
      (Seq(t * math.cos(a), t * math.cos(a) * 0.9),
        Seq(t * math.sin(a), t * math.sin(a) * 0.9))
    }
    val df = rows.toDF("xs", "ys")
    val out = LabelingOps.pcaAlign(df, "xs", "ys").collect()
    out.foreach { r =>
      val ya = r.getAs[scala.collection.Seq[Double]]("ys_aligned")
      ya.foreach(y => assert(math.abs(y) < 1e-9))
    }
  }

  test("pcaAlignDistributed == full-sample pcaAlign (corpus-scale form)") {
    // integer keypoints (the detector contract) so the first-pass sums
    // are FP-exact in any order
    val rows = Seq.tabulate(40) { i =>
      (Seq.tabulate(5)(j => (i + 3 * j % 7).toDouble),
        Seq.tabulate(5)(j => (2 * i % 11 + j).toDouble))
    }
    val df = rows.toDF("xs", "ys")
    val want = LabelingOps.pcaAlign(df, "xs", "ys", sampleN = 1000000)
      .select("xs", "xs_aligned", "ys_aligned").collect()
      .map(r => (r.getSeq[Double](0), r.getSeq[Double](1), r.getSeq[Double](2)))
      .sortBy(_._1.mkString(","))
    val got = LabelingOps.pcaAlignDistributed(df, "xs", "ys")
      .select("xs", "xs_aligned", "ys_aligned").collect()
      .map(r => (r.getSeq[Double](0), r.getSeq[Double](1), r.getSeq[Double](2)))
      .sortBy(_._1.mkString(","))
    want.zip(got).foreach { case ((_, wx, wy), (_, gx, gy)) =>
      wx.zip(gx).foreach { case (w, g) => assert(math.abs(w - g) < 1e-9) }
      wy.zip(gy).foreach { case (w, g) => assert(math.abs(w - g) < 1e-9) }
    }
  }

  test("eyelidDistance = max vertical keypoint gap (M13)") {
    val df = Seq((Seq(0.2, 0.25, 0.22), Seq(0.6, 0.75, 0.7)))
      .toDF("top_ys", "bot_ys")
    val d = df.select(LabelingOps.eyelidDistance(col("top_ys"), col("bot_ys"))
      .as("d")).collect()(0).getDouble(0)
    assert(math.abs(d - 0.5) < 1e-12)
  }
}
