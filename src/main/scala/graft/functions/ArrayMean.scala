package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A10: element-wise mean of an array<double> column (the reference's
  * average-frames QC image, visualization.py:501-522 — and generally the
  * centroid of embedding groups). Partial-aggregates cleanly: the buffer
  * is (element sums, count), merged associatively map-side. */
object ArrayMean {

  type Buf = (Array[Double], Long)

  private val agg: Aggregator[Seq[Double], Buf, Seq[Double]] =
    new Aggregator[Seq[Double], Buf, Seq[Double]] {
      def zero: Buf = (Array.empty[Double], 0L)
      def reduce(b: Buf, a: Seq[Double]): Buf = {
        if (a == null) return b
        // iterator traversal, NOT indexed access: the deserialized Seq is
        // a List, where a(i) is O(i) — indexed summing is O(len²) per row,
        // which the PCA moment pass (len = d+d² ≈ 4k) turned into a
        // 10×-corpus hang. One pass via iterator is O(len) regardless of
        // the runtime Seq type. (a.size is paid once, only on first row.)
        val sums = if (b._1.isEmpty) new Array[Double](a.size) else b._1
        var i = 0
        val it = a.iterator
        while (i < sums.length && it.hasNext) { sums(i) += it.next(); i += 1 }
        (sums, b._2 + 1)
      }
      def merge(x: Buf, y: Buf): Buf = {
        if (x._1.isEmpty) return y
        if (y._1.isEmpty) return x
        var i = 0
        while (i < math.min(x._1.length, y._1.length)) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
      def finish(b: Buf): Seq[Double] =
        if (b._2 == 0) null else b._1.map(_ / b._2).toSeq
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
          .IterableEncoder(
            scala.reflect.classTag[Seq[Double]],
            org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
              .PrimitiveDoubleEncoder,
            containsNull = false, lenientSerialization = false)
    }

  private val fn = udaf(agg)

  /** element-wise mean; null on empty group. */
  def arrayMean(c: Column): Column = fn(c)
}
