package graft.operators

import graft.SparkSpec

/** W7 spline variants. Parity anchors:
  *  - numeric fixtures from an independent numpy linear-solve of the same
  *    not-a-knot / ridge-TPS systems;
  *  - analytic exactness: a not-a-knot spline through samples of a cubic
  *    polynomial reproduces it exactly (scipy kind='cubic' shares this
  *    property), the RBF with smoothing 0 interpolates its knots, and
  *    affine data is reproduced by the polynomial tail alone. */
class SplineOpsSpec extends SparkSpec {
  import spark.implicits._

  val xs = Array(0.0, 0.7, 1.1, 2.0, 3.2, 4.0)
  val ys = Array(1.0, -0.5, 0.3, 2.2, -1.0, 0.4)
  val qs = Array(0.3, 1.0, 1.9, 2.5, 3.9)

  test("cubicInterp matches the independent numpy solve") {
    val expect = Array(-0.2590487051777369, 0.03833908400440646,
      2.182110440213453, 1.201203041136047, -0.21013810375446595)
    val got = SplineOps.cubicInterp(xs, ys, qs)
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("cubic spline reproduces a cubic polynomial exactly (not-a-knot)") {
    def p(x: Double) = 2.0 * x * x * x - 3.0 * x * x + 0.5 * x - 1.0
    val kx = Array(0.0, 0.9, 1.7, 2.3, 3.1, 4.2)
    val q = Array(0.31, 1.11, 2.95, 4.0)
    val got = SplineOps.cubicInterp(kx, kx.map(p), q)
    q.zip(got).foreach { case (x, g) => assert(math.abs(g - p(x)) < 1e-9) }
  }

  test("tpsSmooth1d matches the independent numpy solve (smoothing 0.5)") {
    val expect = Array(0.35152610320850564, 0.23333066688962922,
      1.536629760924669, 0.8203950132024228, 0.058381626552745036)
    val got = SplineOps.tpsSmooth1d(xs, ys, 0.5, qs)
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-10) }
  }

  test("tpsSmooth1d: zero smoothing interpolates; affine data exact") {
    val interp = SplineOps.tpsSmooth1d(xs, ys, 0.0, xs)
    interp.zip(ys).foreach { case (g, e) => assert(math.abs(g - e) < 1e-8) }
    val lin = SplineOps.tpsSmooth1d(xs, xs.map(2.0 * _ + 1.0), 0.0, qs)
    lin.zip(qs).foreach { case (g, q) => assert(math.abs(g - (2.0 * q + 1.0)) < 1e-8) }
  }

  test("resampleGrid follows np.arange semantics") {
    assert(SplineOps.resampleGrid(0.0, 1.0, 10.0).length == 10)
    assert(SplineOps.resampleGrid(0.0, 1.05, 10.0).length == 11)
    assert(SplineOps.resampleGrid(5.0, 5.0, 10.0).isEmpty)
  }

  test("resampleSpline distributes per group and matches the local kernel") {
    val rows = (for (g <- Seq("a", "b"); i <- xs.indices)
      yield (g, xs(i) + (if (g == "b") 10.0 else 0.0), ys(i)))
    val df = rows.toDF("session", "ts", "v")
    val out = SplineOps.resampleSpline(df, "ts", "v", Seq("session"),
        fps = 2.0, method = "cubic")
      .collect().groupBy(_.getString(0))
    val expQ = SplineOps.resampleGrid(0.0, 4.0, 2.0)
    val expV = SplineOps.cubicInterp(xs, ys, expQ)
    for (g <- Seq("a", "b")) {
      val got = out(g).sortBy(_.getDouble(1))
      assert(got.length == expQ.length)
      got.zip(expV).foreach { case (r, e) =>
        assert(math.abs(r.getDouble(2) - e) < 1e-12, s"group $g")
      }
    }
    // NaN rows are dropped before fitting, not propagated
    val withNan = (rows :+ (("a", 2.5, Double.NaN))).toDF("session", "ts", "v")
    val outN = SplineOps.resampleSpline(withNan, "ts", "v", Seq("session"),
      fps = 2.0, method = "thin_plate", smoothing = 0.5).collect()
    assert(outN.nonEmpty && outN.forall(!_.getDouble(2).isNaN))
  }
}
