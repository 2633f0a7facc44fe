package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ asymmetric similarity — the ADC inner product every ANN
  * serving tier ranks candidates with:
  *
  *   asim = Σᵢ qvᵢ · (centroidᵢ + reconᵢ)        (IVF forms)
  *   asim = Σᵢ qvᵢ · reconᵢ                      (flat PQ / OPQ forms)
  *
  * where recon is the codebook reconstruction `books(s)(codes(s) − 1)`
  * concatenated over the m subspaces (codes are the 1-based
  * `array_position` outputs the encode wrote).
  *
  * The declarative form built recon as `flatten(array(m ×
  * element_at(bookLit(s), element_at(codes, s+1))))`, added the centroid
  * via an interpreted `zip_with` and reduced through [[ArrayDot]] — three
  * array allocations plus per-element lambda evaluation per CANDIDATE
  * row. This expression is one flat JVM loop with zero allocation.
  *
  * Bit parity: the add order is `centroid + recon` then `qv · (…)`,
  * accumulated ascending-index from 0.0 — exactly the zip_with + ArrayDot
  * fold (spec-pinned against the HOF form; the ann_* oracle rows pin the
  * end results). Null contract matches the chain: null if any input is
  * null, null on a dimension mismatch (ArrayDot's malformed-row rule),
  * null on an out-of-range code (element_at would have errored — codes
  * written by the encode are always in range).
  */
object PqAsim {

  case class PqAsimExpr(qv: Expression, codes: Expression,
                        cent: Option[Expression],
                        books: Array[Array[Array[Double]]])
      extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(qv, codes) ++ cent.toSeq
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType

    private val m = books.length
    private val subDim = books(0)(0).length
    private val codebookK = books(0).length

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val arrOk = (e: Expression) => e.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
      val codesOk = codes.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
      if (arrOk(qv) && codesOk && cent.forall(arrOk))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_asim needs (array<double>, array<int>[, array<double>]), got " +
          s"${children.map(_.dataType.simpleString).mkString(", ")}")
    }

    override def eval(input: InternalRow): Any = {
      val qvV = qv.eval(input)
      if (qvV == null) return null
      val codesV = codes.eval(input)
      if (codesV == null) return null
      val centV = cent.map(_.eval(input))
      if (centV.contains(null)) return null
      val q = qvV.asInstanceOf[ArrayData]
      val cd = codesV.asInstanceOf[ArrayData]
      val ct = centV.map(_.asInstanceOf[ArrayData]).orNull
      val n = m * subDim
      if (q.numElements() != n || cd.numElements() != m ||
        (ct != null && ct.numElements() != n)) return null
      var acc = 0.0
      var s = 0
      while (s < m) {
        val code = cd.getInt(s)
        if (code < 1 || code > codebookK) return null
        val row = books(s)(code - 1)
        val base = s * subDim
        var j = 0
        while (j < subDim) {
          val i = base + j
          val r = if (ct == null) row(j) else ct.getDouble(i) + row(j)
          acc += q.getDouble(i) * r
          j += 1
        }
        s += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): PqAsimExpr =
      if (cent.isDefined) copy(qv = c(0), codes = c(1), cent = Some(c(2)))
      else copy(qv = c(0), codes = c(1))
  }

  /** IVF form: qv · (centroid + recon(codes)). */
  def pq_asim(qv: Column, centroid: Column, codes: Column,
              books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAsimExpr(Bridge.expression(qv), Bridge.expression(codes),
      Some(Bridge.expression(centroid)), books))

  /** Flat form: qv · recon(codes). */
  def pq_asim(qv: Column, codes: Column,
              books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAsimExpr(Bridge.expression(qv), Bridge.expression(codes),
      None, books))
}
