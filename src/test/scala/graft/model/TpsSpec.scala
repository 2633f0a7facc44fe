package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TpsSpec extends AnyFunSuite {

  val rng = new scala.util.Random(42)
  val anchors: Array[Array[Double]] =
    Array.tabulate(25)(i => Array((i % 5) / 4.0, (i / 5) / 4.0))

  test("lambda=0 fit interpolates anchor values") {
    val f = (x: Double, y: Double) => 0.3 * x + 0.5 * y * y + 0.1
    val v = anchors.map(a => f(a(0), a(1)))
    val theta = Tps.fit(anchors, v, 0.0)
    anchors.zip(v).foreach { case (a, expected) =>
      val got = Tps.z(a(0), a(1), anchors, theta)
      assert(math.abs(got - expected) < 1e-4,
        s"at (${a(0)},${a(1)}): $got vs $expected")
    }
  }

  test("smooth function recovered between anchors") {
    val f = (x: Double, y: Double) => math.sin(2 * x) + math.cos(2 * y)
    val v = anchors.map(a => f(a(0), a(1)))
    val theta = Tps.fit(anchors, v, 1e-6)
    for (_ <- 1 to 50) {
      val x = rng.nextDouble(); val y = rng.nextDouble()
      assert(math.abs(Tps.z(x, y, anchors, theta) - f(x, y)) < 0.05)
    }
  }

  test("LOO-CV prefers small lambda for clean smooth data") {
    val f = (x: Double, y: Double) => x * x + y
    val v = anchors.map(a => f(a(0), a(1)))
    val lambdas = Array(1e-6, 1e-3, 1.0, 100.0)
    val (best, errs) = Tps.looSelect(anchors, v, lambdas,
      r => math.sqrt(r.map(e => e * e).sum / r.length))
    assert(errs.length == 4)
    assert(best < 2, s"expected small lambda, got index $best errs=${errs.toList}")
    assert(errs(best) <= errs.min)
  }

  test("affine part alone is exact for planar data") {
    val v = anchors.map(a => 2.0 * a(0) - 3.0 * a(1) + 0.5)
    val theta = Tps.fit(anchors, v, 0.0)
    // planar data → warp weights ~0, affine coefficients recover the plane
    val n = anchors.length
    assert(math.abs(theta(n) - 0.5) < 1e-6)
    assert(math.abs(theta(n + 1) - 2.0) < 1e-6)
    assert(math.abs(theta(n + 2) + 3.0) < 1e-6)
  }
}
