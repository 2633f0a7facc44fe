package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Gzip kernels for the crawl-archive chain: real `.warc.gz` files are
  * CONCATENATED gzip members (one per record), and `java.util.zip`'s
  * GZIPInputStream reads across member boundaries — so
  * `gunzip(members) → warc_records` recovers every record of a
  * member-concatenated blob ([[WarcParse]]). Row-local, stream-legal.
  *
  * SIZING: a Spark binary value is one byte[], so both the input blob
  * and its decompressed output must fit a JVM array — the unit of
  * ingest is a bounded SEGMENT of an archive (a record group, a
  * `binaryFile` split, a WET chunk), not a whole ~1 GB `.warc.gz`
  * whose 3-5 GB expansion can fit no BinaryType value. [[Gunzip]]
  * enforces that bound explicitly: output beyond `MaxDecompressed`
  * (1 GiB) yields NULL like any other poison blob, instead of dying in
  * an uncatchable OutOfMemoryError mid-allocation.
  *
  * [[Gunzip]] is LENIENT the way an ingest stage must be: a corrupt or
  * truncated stream yields NULL for the whole blob (never a thrown
  * task — the caller's null-filter is the quarantine). [[GzipCompress]]
  * (one member, default deflate level) exists for fixture packing and
  * export symmetry; compression bytes are JVM-deterministic but the
  * oracles never depend on them — planted chains compare the
  * round-tripped CONTENT. */
object Gzip {

  /** Decompressed-output bound for [[Gunzip]] (1 GiB): ByteArrayOutputStream
    * doubles its buffer, so without an explicit cap a >2 GB expansion dies
    * in OutOfMemoryError — an Error the lenient catch cannot see. */
  val MaxDecompressed: Int = 1 << 30

  private object TooLarge extends java.io.IOException(
    "decompressed output exceeds gunzip bound") with scala.util.control.NoStackTrace

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
        while (n >= 0) {
          out.write(buf, 0, n)
          // oversized expansion (mis-chunked archive, zip bomb) is a
          // poison blob, not a task killer — same null as corruption
          if (out.size() > Gzip.MaxDecompressed) throw TooLarge
          n = in.read(buf)
        }
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
