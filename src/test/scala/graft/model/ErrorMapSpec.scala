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

  test("summaryBySession == compute().summary per session (distributed parity)") {
    // two sessions with DIFFERENT planted offsets: the cogrouped form
    // must reproduce the single-session driver form's summary for each,
    // to fp tolerance (anchor order inside the TPS solve is the only
    // difference between the two paths)
    val offs = Map("sA" -> 0.01, "sB" -> 0.02)
    val ms = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Long)]()
    val gs = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Double)]()
    for ((sess, off) <- offs) {
      var t = 0.0; var c = 0L
      for (i <- 0 until 4; j <- 0 until 4) {
        val mx = 0.15 + 0.2 * i; val my = 0.15 + 0.2 * j
        for (_ <- 0 until 5) {
          ms += ((sess, t, mx, my, c))
          gs += ((sess, t + 0.001, mx + off, my, 0.95))
          t += 1.0 / 30.0
        }
        c += 1; t += 0.3
      }
    }
    val mdf = ms.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "marker_cluster_index")
    val gdf = gs.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "confidence")
    val cfg = ErrorMap.Config(resolution = (60, 80))
    val bySession = ErrorMap.summaryBySession(mdf, gdf, "session", cfg)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(bySession.keySet == offs.keySet)
    for (sess <- offs.keys) {
      val single = ErrorMap.compute(
        mdf.filter(col("session") === sess),
        gdf.filter(col("session") === sess),
        cfg.copy(matchKeys = Seq("session"))).summary.collect()(0)
      val r = bySession(sess)
      assert(r.getAs[Long]("n_points") ==
        single.getAs[Int]("n_points").toLong ||
        r.getAs[Long]("n_points") == single.getAs[Number]("n_points").longValue,
        s"$sess n_points")
      for (c <- Seq("err_median", "err_mean", "gaze_err_weighted",
          "gaze_fraction_excluded")) {
        val a = r.getAs[Double](c); val b = single.getAs[Double](c)
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
          s"$sess $c: distributed $a vs single $b")
      }
      graft.CacheRegistry.releaseAll()
    }
    // the planted offsets actually differ between sessions — the
    // per-session isolation is load-bearing, not vacuous
    assert(math.abs(bySession("sB").getAs[Double]("err_median") -
      2 * bySession("sA").getAs[Double]("err_median")) < 1e-6)
  }

  test("summaryBySession honors clusterReduce=false, mci-less markers, zero-gaze sessions, and rejects matchKeys") {
    // one session, 4x4 anchor grid, 3 samples per anchor, constant offset
    val ms = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Long)]()
    val gs = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Double)]()
    var t = 0.0; var c = 0L
    for (i <- 0 until 4; j <- 0 until 4) {
      val mx = 0.15 + 0.2 * i; val my = 0.15 + 0.2 * j
      for (_ <- 0 until 3) {
        ms += (("s1", t, mx, my, c))
        gs += (("s1", t + 0.001, mx + 0.015, my, 0.95))
        t += 1.0 / 30.0
      }
      c += 1; t += 0.3
    }
    val mdf = ms.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "marker_cluster_index")
    val gdf = gs.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "confidence")
    val cfg = ErrorMap.Config(resolution = (60, 80))
    def parity(m: org.apache.spark.sql.DataFrame, cc: ErrorMap.Config): Unit = {
      val dist = ErrorMap.summaryBySession(m, gdf, "session", cc).collect()(0)
      val single = ErrorMap.compute(m, gdf, cc).summary.collect()(0)
      assert(dist.getAs[Long]("n_points") ==
        single.getAs[Number]("n_points").longValue)
      for (col <- Seq("err_median", "err_mean", "gaze_err_weighted",
          "gaze_fraction_excluded")) {
        val a = dist.getAs[Double](col); val b = single.getAs[Double](col)
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
          s"$col: distributed $a vs single $b")
      }
      graft.CacheRegistry.releaseAll()
    }
    // 1. clusterReduce=false: every matched point its own anchor (48),
    // same numbers as compute for the same Config — previously the
    // config was silently ignored and the numbers were the reduced ones
    parity(mdf, cfg.copy(clusterReduce = false))
    // 2. markers WITHOUT marker_cluster_index: the compute() column-
    // presence fallback, not an AnalysisException
    parity(mdf.drop("marker_cluster_index"), cfg)
    // 3. zero in-frame gaze: the fit succeeded (>= 4 points), so the row
    // EXISTS with null weighted fields — absence stays reserved for the
    // too-few-points failure
    val gOut = gdf.withColumn("norm_x", col("norm_x") + 1.5)
    val zr = ErrorMap.summaryBySession(mdf, gOut, "session",
      cfg.copy(outlierStds = None)).collect()
    assert(zr.length == 1, "zero-gaze session lost its summary row")
    assert(zr(0).getAs[Long]("n_points") == 16L)
    assert(!zr(0).isNullAt(zr(0).fieldIndex("err_median")))
    assert(zr(0).isNullAt(zr(0).fieldIndex("gaze_err_weighted")) &&
      zr(0).isNullAt(zr(0).fieldIndex("gaze_fraction_excluded")),
      "weighted fields must be null when there is no gaze to weight")
    // 4. matchKeys would be silently ignored — reject loudly
    intercept[IllegalArgumentException] {
      ErrorMap.summaryBySession(mdf, gdf, "session",
        cfg.copy(matchKeys = Seq("session")))
    }
  }

  test("in-frame gaze entirely outside the hull: weighted error null (compute parity), excluded fraction 1.0") {
    // anchors confined to a corner patch so the hull covers almost
    // nothing; gaze lands IN frame but far outside it → total > 0,
    // inside == 0. The weighted mean is over an empty set: compute()'s
    // SQL sum over an empty when-set is null, and the distributed path
    // must match — 0.0/0.0 would be NaN and break null-aware downstream
    // gates (qc err_weighted_ok).
    val ms2 = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Long)]()
    val gs2 = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Double)]()
    var t2 = 0.0; var c2 = 0L
    for (i <- 0 until 3; j <- 0 until 3) {
      val mx = 0.10 + 0.06 * i; val my = 0.10 + 0.06 * j
      for (_ <- 0 until 3) {
        ms2 += (("s1", t2, mx, my, c2))
        gs2 += (("s1", t2 + 0.001, 0.85, 0.85, 0.95))
        t2 += 1.0 / 30.0
      }
      c2 += 1; t2 += 0.3
    }
    val m2 = ms2.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "marker_cluster_index")
    val g2 = gs2.toSeq.toDF("session", "timestamp", "norm_x", "norm_y",
      "confidence")
    val cfg2 = ErrorMap.Config(resolution = (60, 80), outlierStds = None)
    val r = ErrorMap.summaryBySession(m2, g2, "session", cfg2).collect()(0)
    assert(r.getAs[Long]("n_points") == 9L)
    assert(r.isNullAt(r.fieldIndex("gaze_err_weighted")),
      "empty-inside weighted error must be null, not NaN")
    assert(r.getAs[Double]("gaze_fraction_excluded") == 1.0)
    val s = ErrorMap.compute(m2, g2, cfg2).summary.collect()(0)
    assert(s.isNullAt(s.fieldIndex("gaze_err_weighted")),
      "compute() contract drifted: expected null for empty inside-set")
    graft.CacheRegistry.releaseAll()
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
