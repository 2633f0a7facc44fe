package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Gzip kernels for the crawl-archive chain: real `.warc.gz` files are
  * CONCATENATED gzip members (one per record), and `java.util.zip`'s
  * GZIPInputStream reads across member boundaries — so
  * `gunzip(members) → warc_records` is the standard streaming-read of a
  * CommonCrawl archive ([[WarcParse]]). Row-local, stream-legal.
  *
  * [[Gunzip]] is LENIENT the way an ingest stage must be: a corrupt or
  * truncated stream yields NULL for the whole blob (never a thrown
  * task — the caller's null-filter is the quarantine). [[GzipCompress]]
  * (one member, default deflate level) exists for fixture packing and
  * export symmetry; compression bytes are JVM-deterministic but the
  * oracles never depend on them — planted chains compare the
  * round-tripped CONTENT. */
object Gzip {

  case class GzipCompress(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gzip needs binary, got ${child.dataType.simpleString}")
    override def nullSafeEval(input: Any): Any = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(input.asInstanceOf[Array[Byte]]); gz.close()
      bos.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): GzipCompress =
      copy(child = c)
  }

  case class Gunzip(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gunzip needs binary, got ${child.dataType.simpleString}")
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 64 * 1024)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        out.toByteArray
      } catch { case _: java.io.IOException => null } // corrupt ⇒ null row
    }
    override protected def withNewChildInternal(c: Expression): Gunzip =
      copy(child = c)
  }

  def gzip(bin: Column): Column =
    Bridge.column(GzipCompress(Bridge.expression(bin)))

  def gunzip(bin: Column): Column =
    Bridge.column(Gunzip(Bridge.expression(bin)))
}
