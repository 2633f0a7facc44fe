package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side verification of the planted-fit constructions behind the
  * m3/m5/m6/m7 direct oracle queries (Queries.fitBase): the inlier/outlier
  * classification must be robust (wide margins), the refits must recover
  * the planted affine exactly, and the RBF grid winner must sit at
  * smoothness 0 so the final fit interpolates its nodes. */
class PlantedFitSpec extends AnyFunSuite {

  // the 25 reduced constants of Queries.fitBase, cluster order
  def pts: (Array[Array[Double]], Array[Double], Array[Double]) = {
    val pxy = Array.tabulate(25) { c =>
      Array(0.1 + (c % 5) * 0.2 + ((c * 7) % 3) * 0.013,
        0.1 + (c / 5) * 0.2 + ((c * 3) % 5) * 0.007)
    }
    (pxy, pxy.map(p => p(0) * 0.8 - p(1) * 0.3 + 0.15),
      pxy.map(p => p(0) * 0.2 + p(1) * 1.1 - 0.05))
  }

  test("m3: two-pass robust poly recovers planted affine after outlier cut") {
    val (pxy, mx, my) = pts
    // per-ROW fit like the query: replicate each cluster point 4x with
    // one outlier cluster (7) offset +20/-20
    val ins = Array.tabulate(100)(i => pxy(i % 25))
    val tx = Array.tabulate(100)(i => mx(i % 25) + (if (i % 25 == 7) 20.0 else 0.0))
    val ty = Array.tabulate(100)(i => my(i % 25) - (if (i % 25 == 7) 20.0 else 0.0))
    // margin check: first-pass residuals must separate cleanly at 8.0
    val (_, _, ex, ey) = Poly.fitSurface(ins, tx, ty, 3)
    val errDist = ex.zip(ey).map { case (a, b) => math.sqrt(a * a + b * b) }
    val inl = errDist.zipWithIndex.filter(_._2 % 25 != 7).map(_._1)
    val out = errDist.zipWithIndex.filter(_._2 % 25 == 7).map(_._1)
    assert(inl.max < 4.0, s"inlier residual too close to gate: ${inl.max}")
    assert(out.min > 16.0, s"outlier residual too close to gate: ${out.min}")
    val m = Poly.calibrate(ins, tx, ty, n = 3, screenSize = (2.0, 2.0),
      maxAbsErr = 8.0).get
    val want = (Array(0.8, -0.3, 0.15), Array(0.2, 1.1, -0.05))
    m.cx.zip(want._1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    m.cy.zip(want._2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("m6: TPS LOO-CV cut drops exactly the two planted outlier anchors") {
    val (pxy, mx, my) = pts
    val tx = mx.zipWithIndex.map { case (v, c) =>
      v + (if (c == 7 || c == 18) 5.0 else 0.0) }
    val ty = my.zipWithIndex.map { case (v, c) =>
      v + (if (c == 7 || c == 18) 5.0 else 0.0) }
    val m = Calibrator.fitTpsCv(pxy, tx, ty, Calibrator.DefaultLambdas,
      maxStds = Some(3.0))
    assert(m.anchorsX.length == 23, s"cut kept ${m.anchorsX.length} anchors")
    // the refit must be the exact planted affine everywhere
    val errs = pxy.map { p =>
      val gx = Tps.z(p(0), p(1), m.anchorsX, m.thetaX)
      val gy = Tps.z(p(0), p(1), m.anchorsY, m.thetaY)
      math.max(math.abs(gx - (p(0) * 0.8 - p(1) * 0.3 + 0.15)),
        math.abs(gy - (p(0) * 0.2 + p(1) * 1.1 - 0.05)))
    }
    assert(errs.max < 1e-8, s"refit deviates from planted affine: ${errs.max}")
  }

  test("m7: RBF grid winner has smoothness 0 and interpolates its nodes") {
    val (pxy, mx, my) = pts
    val kernels = Seq("thin_plate", "multiquadric", "linear", "cubic")
    val (k, s, errs) = Rbf.looSelect(pxy, mx, my, kernels, Seq(0.0, 5.0, 50.0))
    info(s"winner kernel=$k smooth=$s errs=${errs.map(e => f"$e%.4g").mkString(",")}")
    assert(s == 0.0, s"winner smoothness $s != 0 — node check would fail")
    val fx = Rbf.fit(pxy, mx, k, s); val fy = Rbf.fit(pxy, my, k, s)
    val dev = pxy.indices.map { i =>
      math.max(math.abs(fx.predict(pxy(i)(0), pxy(i)(1)) - mx(i)),
        math.abs(fy.predict(pxy(i)(0), pxy(i)(1)) - my(i)))
    }
    assert(dev.max < 1e-6, s"interpolation deviates at nodes: ${dev.max}")
  }
}
