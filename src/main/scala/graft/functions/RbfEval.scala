package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native RBF interpolant evaluation: Σᵢ wᵢ·φ(‖(px,py) − nodeᵢ‖) — the
  * [[graft.model.RbfMapModel]] apply (m7 gaze map).
  *
  * The HOF formulation (`aggregate(typedLit(packed), …)`) deserialized a
  * node×(x,y,w) struct-array literal and evaluated the kernel lambda
  * through the interpreted path per node per row per axis; this
  * expression is one flat JVM loop per row over plain double arrays
  * (the [[TpsEval]] discipline).
  *
  * Operation order is IDENTICAL to the HOF form — ascending-node left
  * fold from 0.0, `acc + w·φ`, multiquadric as `(r/ε)·(r/ε)+1` (never
  * r²/ε²), thin-plate `r²·log r` via StrictMath.log (Spark's Log
  * evaluates StrictMath; the Math.log C2 intrinsic diverges in the last
  * ulp) — so results are bit-equal (locked by the parity spec and the
  * m7 oracle's fp-exact planted-affine check). */
case class RbfEval(px: Expression, py: Expression,
                   xs: Array[Double], ys: Array[Double], ws: Array[Double],
                   kernel: String, eps: Double)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(px, py)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(px, py).forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rbf_eval needs (double, double), got " +
        s"${children.map(_.dataType.simpleString).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val pxv = px.eval(input)
    val pyv = py.eval(input)
    if (pxv == null || pyv == null) return null
    val x = pxv.asInstanceOf[Double]
    val y = pyv.asInstanceOf[Double]
    var acc = 0.0
    var i = 0
    while (i < xs.length) {
      val dx = x - xs(i)
      val dy = y - ys(i)
      val r = math.sqrt(dx * dx + dy * dy)
      val k = kernel match {
        case "multiquadric" => math.sqrt((r / eps) * (r / eps) + 1.0)
        case "linear" => r
        case "cubic" => r * r * r
        case "thin_plate" => if (r == 0.0) 0.0 else r * r * StrictMath.log(r)
        case other => throw new IllegalArgumentException(s"unknown kernel $other")
      }
      acc += ws(i) * k
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RbfEval = copy(px = c(0), py = c(1))
}

object RbfEval {
  def rbf_eval(px: Column, py: Column, m: graft.model.Rbf.Model): Column =
    Bridge.column(RbfEval(Bridge.expression(px), Bridge.expression(py),
      m.xy.map(_(0)), m.xy.map(_(1)), m.w, m.kernel, m.eps))
}
