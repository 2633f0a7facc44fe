package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Gzip kernels for the crawl-archive chain: real `.warc.gz` files are
  * CONCATENATED gzip members (one per record), and [[Gunzip]] walks the
  * member chain itself (RFC 1952 header/deflate/trailer per member, CRC
  * and ISIZE verified) — so `gunzip(members) → warc_records` recovers
  * every record of a member-concatenated blob ([[WarcParse]]), and a
  * blob whose tail is NOT a valid member chain is rejected whole
  * (the JDK's GZIPInputStream would silently return the truncated
  * prefix). Row-local, stream-legal.
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

  private object BadStream extends java.io.IOException(
    "malformed gzip stream") with scala.util.control.NoStackTrace

  /** Inflate ONE gzip member starting at `start`, appending to `out`;
    * returns the offset just past the member's trailer. Throws
    * IOException on ANY malformation: bad magic/method, truncated
    * header/deflate/trailer, CRC32 or ISIZE mismatch, output beyond
    * [[MaxDecompressed]]. (The 2-byte FHCRC, when present, is skipped
    * unverified — the body CRC32 already covers the content.) */
  private[functions] def inflateMember(b: Array[Byte], start: Int,
                                       out: java.io.ByteArrayOutputStream): Int = {
    def u8(i: Int): Int = {
      if (i < 0 || i >= b.length) throw BadStream
      b(i) & 0xff
    }
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (u8(start) != 0x1f || u8(start + 1) != 0x8b) throw BadStream
    if (u8(start + 2) != 8) throw BadStream // CM: deflate only
    val flg = u8(start + 3)
    var p = start + 10 // magic(2) cm(1) flg(1) mtime(4) xfl(1) os(1)
    if ((flg & 4) != 0) p += 2 + (u8(p) | (u8(p + 1) << 8)) // FEXTRA
    if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p > b.length) throw BadStream
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val crc = new java.util.zip.CRC32()
      val buf = new Array[Byte](64 * 1024)
      var memberOut = 0L
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => throw BadStream }
        if (n == 0 && !inf.finished()) throw BadStream // truncated/needs dict
        out.write(buf, 0, n); crc.update(buf, 0, n); memberOut += n
        // oversized expansion (mis-chunked archive, zip bomb) is a
        // poison blob, not a task killer — same null as corruption
        if (out.size() > MaxDecompressed) throw TooLarge
      }
      val trailer = p + inf.getBytesRead.toInt
      if (u32(trailer) != crc.getValue) throw BadStream
      if (u32(trailer + 4) != (memberOut & 0xffffffffL)) throw BadStream
      trailer + 8
    } finally inf.end()
  }

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
      // manual RFC 1952 member walk instead of GZIPInputStream: the JDK
      // stream treats garbage after a complete member as clean EOF, so a
      // corrupted concatenated blob (valid member + junk tail) would
      // return a silently TRUNCATED prefix — downstream sees fewer
      // records with no quarantine signal. Walking members with exact
      // offset accounting makes every malformation — junk tail, bad
      // magic, truncated deflate, CRC/ISIZE mismatch — the same null
      // poison as any other corruption.
      try {
        if (bytes.length == 0) throw BadStream
        val out = new java.io.ByteArrayOutputStream()
        var off = 0
        while (off < bytes.length && !zeroPadTail(bytes, off))
          off = Gzip.inflateMember(bytes, off, out)
        out.toByteArray
      } catch { case _: java.io.IOException => null } // corrupt ⇒ null row
    }
    /** True when everything from `off` on is zero bytes AND at least one
      * member was already consumed (`off > 0`): some gzip producers pad
      * archives to a tape/block boundary with NULs, and losing every valid
      * leading record to that benign tail would be the wrong poison. Any
      * NONZERO junk after the last member still nulls the whole blob. */
    private def zeroPadTail(b: Array[Byte], off: Int): Boolean = {
      if (off == 0) return false
      var i = off
      while (i < b.length) { if (b(i) != 0) return false; i += 1 }
      true
    }

    override protected def withNewChildInternal(c: Expression): Gunzip =
      copy(child = c)
  }

  def gzip(bin: Column): Column =
    Bridge.column(GzipCompress(Bridge.expression(bin)))

  def gunzip(bin: Column): Column =
    Bridge.column(Gunzip(Bridge.expression(bin)))
}
