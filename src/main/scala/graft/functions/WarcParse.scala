package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC record splitter — the CommonCrawl/web-archive ingest edge
  * (ISO 28500): a blob holds concatenated records, each
  *
  * ```
  * WARC/1.0\r\n
  * <Header>: <value>\r\n ...
  * \r\n
  * <Content-Length bytes of payload>\r\n\r\n
  * ```
  *
  * Framing is by the `Content-Length` BYTE count — a payload may contain
  * `\r\n\r\n` (or another record verbatim) without confusing the parser,
  * which is the whole reason the format length-frames (spec-pinned).
  * Parsing is per-blob row-local (one eval, one tight byte scan), so it
  * explodes under `readStream` unchanged and distributes by blob — the
  * natural unit, since crawl archives arrive as ~1 GB WARC files.
  *
  * Lenient tail: a malformed or truncated record ends the parse and the
  * records before it are returned (crawl archives are routinely
  * truncated mid-record; an ingest stage must not throw). Returns
  * `array<struct<warc_type, uri, content_length, payload>>` in record
  * order; absent headers surface as null.
  */
object WarcParse {

  private val recordSchema = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("uri", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType)))

  case class WarcRecords(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(recordSchema)

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType | BinaryType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"warc_records needs string or binary, got ${other.simpleString}")
      }

    private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i + 3 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    override def nullSafeEval(input: Any): Any = {
      val bytes = input match {
        case s: UTF8String => s.getBytes
        case a: Array[Byte] => a
      }
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var pos = 0
      var ok = true
      while (ok && pos < bytes.length) {
        // skip inter-record padding
        while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) ok = false
        else {
          val hdrEnd = indexOfCrlfCrlf(bytes, pos)
          if (hdrEnd < 0) ok = false
          else {
            val header = new String(bytes, pos, hdrEnd - pos, "UTF-8")
            val lines = header.split("\r\n")
            if (!lines.headOption.exists(_.startsWith("WARC/"))) ok = false
            else {
              val kv = lines.drop(1).flatMap { l =>
                val c = l.indexOf(':')
                if (c < 0) None
                else Some(l.substring(0, c).trim.toLowerCase ->
                  l.substring(c + 1).trim)
              }.toMap
              kv.get("content-length").flatMap(s =>
                scala.util.Try(s.toLong).toOption) match {
                case Some(len) if len >= 0 &&
                    hdrEnd + 4 + len <= bytes.length =>
                  val payload = UTF8String.fromBytes(
                    bytes, hdrEnd + 4, len.toInt)
                  out += org.apache.spark.sql.catalyst.InternalRow(
                    kv.get("warc-type").map(UTF8String.fromString).orNull,
                    kv.get("warc-target-uri").map(UTF8String.fromString).orNull,
                    len, payload)
                  pos = hdrEnd + 4 + len.toInt
                case _ => ok = false // truncated or malformed: lenient stop
              }
            }
          }
        }
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): WarcRecords =
      copy(child = c)
  }

  def warc_records(blob: Column): Column =
    Bridge.column(WarcRecords(Bridge.expression(blob)))
}
