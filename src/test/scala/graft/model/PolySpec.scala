package graft.model

import org.scalatest.funsuite.AnyFunSuite

class PolySpec extends AnyFunSuite {

  val rng = new scala.util.Random(7)

  // ground-truth n=7 map: gaze = c · [x, y, x², y², xy, x²y², 1]
  val cxTrue = Array(0.9, 0.1, 0.05, -0.02, 0.03, 0.01, 0.02)
  val cyTrue = Array(-0.1, 1.1, 0.02, 0.06, -0.04, 0.02, -0.01)
  def applyTrue(c: Array[Double], x: Double, y: Double): Double =
    c(0) * x + c(1) * y + c(2) * x * x + c(3) * y * y + c(4) * x * y +
      c(5) * x * x * y * y + c(6)

  val ins: Array[Array[Double]] =
    Array.fill(60)(Array(rng.nextDouble(), rng.nextDouble()))
  val tx: Array[Double] = ins.map(p => applyTrue(cxTrue, p(0), p(1)))
  val ty: Array[Double] = ins.map(p => applyTrue(cyTrue, p(0), p(1)))

  test("fitSurface recovers exact coefficients on noiseless data") {
    val (cx, cy, ex, ey) = Poly.fitSurface(ins, tx, ty, 7)
    cx.zip(cxTrue).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    cy.zip(cyTrue).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(ex.forall(e => math.abs(e) < 1e-10))
    assert(ey.forall(e => math.abs(e) < 1e-10))
  }

  test("two-pass calibrate survives a planted outlier") {
    // +0.5 normalized ≈ 500 px at screen scale: far over the 35 px cut for
    // the outlier itself, while inlier residuals stay ~ outlier/N ≈ 8 px
    val insO = ins :+ Array(0.5, 0.5)
    val txO = tx :+ (applyTrue(cxTrue, 0.5, 0.5) + 0.5)
    val tyO = ty :+ (applyTrue(cyTrue, 0.5, 0.5) - 0.5)
    val model = Poly.calibrate(insO, txO, tyO, 7, screenSize = (2048, 1536)).get
    model.cx.zip(cxTrue).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
  }

  test("every model n produces the right feature arity") {
    assert(Poly.features(Array(0.1, 0.2), 3).length == 3)
    assert(Poly.features(Array(0.1, 0.2, 0.3, 0.4), 5).length == 5)
    assert(Poly.features(Array(0.1, 0.2), 7).length == 7)
    assert(Poly.features(Array(0.1, 0.2), 9).length == 9)
    assert(Poly.features(Array(0.1, 0.2, 0.3, 0.4), 13).length == 13)
    assert(Poly.features(Array(0.1, 0.2, 0.3, 0.4), 17).length == 17)
  }

  test("median/stdPop match numpy semantics") {
    assert(Stats.median(Array(1.0, 3.0, 2.0)) == 2.0)
    assert(Stats.median(Array(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(math.abs(Stats.stdPop(Array(1.0, 2.0, 3.0, 4.0)) -
      math.sqrt(1.25)) < 1e-12)
  }
}
