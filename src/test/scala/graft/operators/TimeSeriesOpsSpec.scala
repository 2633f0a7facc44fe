package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rleSegments: leading/trailing on-state edge cases (utils.py:153-191)") {
    // on at start, gap in middle, on at end
    val df = Seq(
      (0.0, 1), (1.0, 1), (2.0, 0), (3.0, 0), (4.0, 1), (5.0, 0), (6.0, 1))
      .toDF("t", "on")
    val segs = TimeSeriesOps.rleSegments(df, "t", col("on") === 1, Nil)
      .orderBy("onset").collect()
    assert(segs.map(r => (r.getAs[Double]("onset"), r.getAs[Double]("offset"),
      r.getAs[Long]("n_rows"))).toSeq ==
      Seq((0.0, 1.0, 2L), (4.0, 4.0, 1L), (6.0, 6.0, 1L)))
  }

  test("sessionize: gap split + duration filter (marker_parsing.py:187-258)") {
    val df = (Seq.tabulate(40)(i => i * 1.0) ++ // 0..39s session
      Seq.tabulate(10)(i => 100.0 + i) ++       // 100..109 (too short: 9s)
      Seq.tabulate(60)(i => 200.0 + i))         // 200..259 (60s ok? max 150)
      .map(t => ("a", t)).toDF("k", "t")
    val ses = TimeSeriesOps.sessionize(df, "t", Seq("k"), 15.0)
    assert(ses.select("session_id").distinct().count() == 3)
    val kept = TimeSeriesOps.sessionDurationFilter(
      ses, "t", Seq("k"), "session_id", 30.0, 150.0)
    assert(kept.select("session_id").distinct().count() == 2)
  }

  test("dropDuplicateTimestamps removes ALL copies (marker_parsing.py:27-29)") {
    val df = Seq((1.0, "a"), (1.0, "b"), (2.0, "c"), (3.0, "d"))
      .toDF("ts", "v")
    val out = TimeSeriesOps.dropDuplicateTimestamps(df, "ts").collect()
    assert(out.map(_.getString(1)).sorted.toSeq == Seq("c", "d"))
  }

  test("gradient matches numpy.gradient on irregular grid") {
    // numpy central difference: (v[i+1]-v[i-1])/(t[i+1]-t[i-1]); one-sided at ends
    val df = Seq((0.0, 0.0), (1.0, 1.0), (3.0, 9.0), (4.0, 16.0))
      .toDF("t", "v")
    val g = TimeSeriesOps.gradient(df, "t", "v", Nil, "vel")
      .orderBy("t").collect().map(_.getAs[Double]("vel"))
    assert(g(0) == 1.0)           // (1-0)/(1-0)
    assert(g(1) == 3.0)           // (9-0)/(3-0)
    assert(g(2) == 5.0)           // (16-1)/(4-1)
    assert(g(3) == 7.0)           // (16-9)/(4-3)
  }

  test("zScoreFilter drops the outlier only") {
    val df = (Seq.fill(20)(10.0) ++ Seq(10.5, 1000.0)).zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("id", "v")
    val out = TimeSeriesOps.zScoreFilter(df, "v", Nil, 3.0)
    assert(out.count() == 21)
    assert(out.filter(col("v") === 1000.0).count() == 0)
  }

  test("resampleLinear interpolates onto a regular grid") {
    val df = Seq((0.0, 0.0), (1.0, 10.0), (2.0, 20.0), (4.0, 40.0))
      .toDF("t", "v")
    val out = TimeSeriesOps.resampleLinear(df, "t", Seq("v"), Nil, 0.5)
      .orderBy("t").collect()
    assert(out.length == 9) // 0.0 .. 4.0 step 0.5
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("v") - r.getAs[Double]("t") * 10) < 1e-9)
    }
  }

  test("slidingRate counts within the window") {
    val df = Seq.tabulate(11)(i => (1L, i.toLong * 1000000L))
      .toDF("k", "us") // 1 Hz for 11 s in µs
    val out = TimeSeriesOps.slidingRate(df, "us", Seq("k"), 4000000L)
      .orderBy("us").collect()
    // middle rows see ±2 s → 5 events
    assert(out(5).getAs[Long]("rate") == 5)
    assert(out(0).getAs[Long]("rate") == 3)
  }

  test("searchSorted matches numpy searchsorted 'left' (J6)") {
    val clock = Seq(0.0, 1.0, 2.0, 3.0).toDF("timestamp")
    val q = Seq(-0.5, 0.0, 1.5, 2.0, 9.0).toDF("t")
    val out = TimeSeriesOps.searchSorted(q, clock, "t", "timestamp")
      .orderBy("t").collect().map(_.getAs[Long]("frame_index"))
    // numpy: searchsorted([0,1,2,3], [-0.5,0,1.5,2,9], 'left') = [0,0,2,2,4]
    assert(out.toSeq == Seq(0L, 0L, 2L, 2L, 4L))
  }

  test("medfiltDetrend: scipy zero-padded kernel + impute recenter (P10)") {
    import spark.implicits._
    val v = Seq(0.52, 0.48, 0.55, 0.61, 0.43, 0.50, 0.58, 0.47)
    // expected = v - medfilt(v, 5) + 0.5 with scipy's zero-padded edges
    val expect = Seq(0.54, 0.45999999999999996, 0.53, 0.61,
      0.37999999999999995, 0.5, 0.61, 0.5)
    val df = v.zipWithIndex.map { case (x, i) => ("s", i.toDouble, x) }
      .toDF("session", "ts", "v")
    val out = TimeSeriesOps.medfiltDetrend(df, "ts", "v", Seq("session"),
        kernelSize = 5, impute = Some(0.5))
      .orderBy("ts").collect().map(_.getAs[Double]("detrended"))
    out.zip(expect).foreach { case (g, e) => assert(g == e) }
    // two groups detrend independently (second group shifted by +1.0)
    val df2 = df.unionByName(
      v.zipWithIndex.map { case (x, i) => ("t", i.toDouble, x + 1.0) }
        .toDF("session", "ts", "v"))
    val out2 = TimeSeriesOps.medfiltDetrend(df2, "ts", "v", Seq("session"),
      kernelSize = 5, impute = None)
    assert(out2.count() == 16)
    // interior rows (full windows): detrend is shift-invariant there, but
    // zero-padded EDGE windows are not — the shifted group's edge medians
    // still include the zero pad, a reference-faithful artifact
    val a = out2.filter($"session" === "s" && $"ts" === 3.0)
      .collect()(0).getAs[Double]("detrended")
    val b = out2.filter($"session" === "t" && $"ts" === 3.0)
      .collect()(0).getAs[Double]("detrended")
    assert(math.abs(a - b) < 1e-12)
  }
}
