package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native thin-plate-spline evaluation:
  * θ(n) + θ(n+1)·px + θ(n+2)·py + Σᵢ θ(i)·r·r·ln(r+1e-6),
  * r = ‖(px,py) − anchorᵢ‖ — the distributed gaze-map apply
  * (TpsMapModel / SessionCalibrator model-table fan-out).
  *
  * The HOF formulation (`aggregate(sequence(1, n), …)` with element_at
  * per anchor) evaluates the lambda through the interpreted path per
  * anchor per row per axis; this expression is one flat JVM loop per row.
  * Operation order is IDENTICAL to both HOF forms — ascending-index left
  * fold starting at 0.0, ((θ·r)·r)·ln term shape, affine tail added
  * left-to-right — so results are bit-equal (locked by the
  * literal-vs-data-driven parity spec and the m8 oracle). */
case class TpsEval(px: Expression, py: Expression, ax: Expression,
                   ay: Expression, theta: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(px, py, ax, ay, theta)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    val scalarsOk = Seq(px, py).forall(_.dataType == DoubleType)
    val arraysOk = Seq(ax, ay, theta).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (scalarsOk && arraysOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tps_eval needs (double, double, array<double>, array<double>, " +
        s"array<double>), got ${children.map(_.dataType.simpleString).mkString(", ")}")
  }

  override def eval(input: InternalRow): Any = {
    val pxv = px.eval(input)
    val pyv = py.eval(input)
    val axv = ax.eval(input)
    val ayv = ay.eval(input)
    val thv = theta.eval(input)
    if (pxv == null || pyv == null || axv == null || ayv == null || thv == null)
      return null
    val x = pxv.asInstanceOf[Double]
    val y = pyv.asInstanceOf[Double]
    val axA = axv.asInstanceOf[ArrayData]
    val ayA = ayv.asInstanceOf[ArrayData]
    val th = thv.asInstanceOf[ArrayData]
    val n = axA.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dx = x - axA.getDouble(i)
      val dy = y - ayA.getDouble(i)
      val r = math.sqrt(dx * dx + dy * dy)
      // StrictMath.log: Spark's Log expression evaluates via StrictMath,
      // and Math.log diverges in the last ulp once the C2 intrinsic kicks
      // in — the bit-equality contract with the HOF form requires strict
      acc += th.getDouble(i) * r * r * StrictMath.log(r + 1e-6)
      i += 1
    }
    th.getDouble(n) + th.getDouble(n + 1) * x + th.getDouble(n + 2) * y + acc
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TpsEval =
    TpsEval(c(0), c(1), c(2), c(3), c(4))
}

object TpsEval {
  def tps_eval(px: Column, py: Column, ax: Column, ay: Column,
               theta: Column): Column =
    Bridge.column(TpsEval(Bridge.expression(px), Bridge.expression(py),
      Bridge.expression(ax), Bridge.expression(ay), Bridge.expression(theta)))
}
