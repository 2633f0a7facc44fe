package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W7 spline resample variants — the two non-linear interpolators the
  * reference uses next to linear resampling:
  *
  *  - cubic: `interpolate.interp1d(t, v, kind='cubic')` over the uniform
  *    fps grid (odometry resample, odometry.py:65-76). scipy's 'cubic' is
  *    the not-a-knot interpolating cubic spline; a spline through samples
  *    of any cubic polynomial reproduces it exactly, which the spec uses
  *    as the parity anchor.
  *  - thin-plate RBF with smoothing:
  *    `RBFInterpolator(t, v, kernel='thin_plate_spline', smoothing=s)`
  *    (eyelid-series smoothing, labeling.py:59-87): φ(r) = r²·ln r plus a
  *    degree-1 polynomial tail, ridge term s on the kernel diagonal.
  *
  * Distribution shape: groups are sessions/epochs (10³-10⁵ rows) — the
  * spline solve runs INSIDE `flatMapGroups` like DBSCAN; the grid fan-out
  * is emitted directly from the group, so the operator is one shuffle.
  */
object SplineOps {

  /** np.arange(t0, t1, 1/fps): k < ceil((t1−t0)·fps) values. */
  def resampleGrid(t0: Double, t1: Double, fps: Double): Array[Double] = {
    val step = 1.0 / fps
    val n = math.max(0, math.ceil((t1 - t0) / step).toInt)
    Array.tabulate(n)(i => t0 + i * step)
  }

  /** Not-a-knot cubic spline through (xs, ys) evaluated at qs
    * (scipy interp1d kind='cubic' semantics; needs ≥ 4 points). */
  def cubicInterp(xs: Array[Double], ys: Array[Double],
                  qs: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 4, s"cubic spline needs >= 4 points, got $n")
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val a = DenseMatrix.zeros[Double](n, n)
    val b = DenseVector.zeros[Double](n)
    // unknowns: second derivatives M_i; not-a-knot = continuous third
    // derivative across x_1 and x_{n-2}
    a(0, 0) = h(1); a(0, 1) = -(h(0) + h(1)); a(0, 2) = h(0)
    a(n - 1, n - 3) = h(n - 2)
    a(n - 1, n - 2) = -(h(n - 3) + h(n - 2))
    a(n - 1, n - 1) = h(n - 3)
    var i = 1
    while (i < n - 1) {
      a(i, i - 1) = h(i - 1) / 6.0
      a(i, i) = (h(i - 1) + h(i)) / 3.0
      a(i, i + 1) = h(i) / 6.0
      b(i) = (ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1)
      i += 1
    }
    val m = a \ b
    qs.map { q =>
      val k0 = java.util.Arrays.binarySearch(xs, q)
      val k = if (k0 >= 0) math.min(k0, n - 2) else math.min(math.max(-k0 - 2, 0), n - 2)
      val t = q - xs(k); val hh = h(k)
      ys(k) +
        t * ((ys(k + 1) - ys(k)) / hh - hh / 6.0 * (2.0 * m(k) + m(k + 1))) +
        t * t * m(k) / 2.0 +
        t * t * t * (m(k + 1) - m(k)) / (6.0 * hh)
    }
  }

  /** 1-D thin-plate RBF with ridge smoothing: f(x) = Σ wᵢ·φ(|x−xᵢ|) + c₀ +
    * c₁·x, φ(r) = r²·ln r (0 at r = 0), system
    * [[K + s·I, P], [Pᵀ, 0]]·[w, c] = [y, 0]. smoothing = 0 interpolates
    * exactly; affine data is reproduced by the polynomial tail alone. */
  def tpsSmooth1d(xs: Array[Double], ys: Array[Double], smoothing: Double,
                  qs: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, s"thin-plate resample needs >= 2 points, got $n")
    def phi(r: Double): Double = if (r == 0.0) 0.0 else r * r * math.log(r)
    val a = DenseMatrix.zeros[Double](n + 2, n + 2)
    val b = DenseVector.zeros[Double](n + 2)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        a(i, j) = phi(math.abs(xs(i) - xs(j))) + (if (i == j) smoothing else 0.0)
        j += 1
      }
      a(i, n) = 1.0; a(i, n + 1) = xs(i)
      a(n, i) = 1.0; a(n + 1, i) = xs(i)
      b(i) = ys(i)
      i += 1
    }
    val w = a \ b
    qs.map { q =>
      var acc = w(n) + w(n + 1) * q
      var k = 0
      while (k < n) { acc += w(k) * phi(math.abs(q - xs(k))); k += 1 }
      acc
    }
  }

  /** Per-group spline resample onto the uniform fps grid. NaN value rows
    * are dropped before fitting (remove_nans, labeling.py:68-76); groups
    * too small for the interpolator pass through empty. `method`:
    * "cubic" | "thin_plate". */
  def resampleSpline(df: DataFrame, tsCol: String, valueCol: String,
                     keys: Seq[String], fps: Double,
                     method: String = "cubic",
                     smoothing: Double = 0.0): DataFrame = {
    require(method == "cubic" || method == "thin_plate", s"method $method")
    val tsIdx = df.schema.fieldIndex(tsCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    val gIdx = keys.map(df.schema.fieldIndex)
    val outSchema = StructType(keys.map(df.schema(_)) :+
      StructField("t", DoubleType) :+ StructField(valueCol, DoubleType))
    val minPts = if (method == "cubic") 4 else 2
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.groupByKey(r => GroupKeys.of(r, gIdx))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_.getDouble(tsIdx))
        val kept = rows.filterNot(r => r.isNullAt(vIdx) || r.getDouble(vIdx).isNaN)
        if (kept.length < minPts) Iterator.empty
        else {
          val xs = kept.map(_.getDouble(tsIdx))
          val ys = kept.map(_.getDouble(vIdx))
          val qs = resampleGrid(xs.head, xs.last, fps)
          val vs =
            if (method == "cubic") cubicInterp(xs, ys, qs)
            else tpsSmooth1d(xs, ys, smoothing, qs)
          val keyVals = gIdx.map(kept(0).get)
          qs.iterator.zip(vs.iterator).map { case (q, v) =>
            Row.fromSeq(keyVals :+ q :+ v)
          }
        }
      }
  }
}
