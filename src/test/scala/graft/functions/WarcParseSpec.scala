package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WarcParse.WarcRecords]]: Content-Length framing, lenient tails,
  * header handling — the crawl-archive ingest contract. */
class WarcParseSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, payload: String,
                  wtype: String = "response"): String =
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"

  private def parse(blob: String) =
    Seq(Tuple1(blob)).toDF("b")
      .select(explode(WarcParse.warc_records(col("b"))).as("r"))
      .select(col("r.warc_type"), col("r.uri"), col("r.content_length"),
        col("r.payload"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSeq

  test("length framing survives payloads embedding delimiters and fake records") {
    val evil = "body\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nmore"
    val blob = rec("http://a", evil) + rec("http://b", "clean")
    assert(parse(blob) == Seq(
      ("response", "http://a", evil.length.toLong, evil),
      ("response", "http://b", 5L, "clean")))
  }

  test("warcinfo/request types and missing headers surface as-is") {
    val blob = "WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n" +
      rec("http://x", "y", wtype = "request")
    val out = parse(blob)
    assert(out.size == 2)
    assert(out.head._1 == null && out.head._2 == null && out.head._4 == "hi")
    assert(out(1) == (("request", "http://x", 1L, "y")))
  }

  test("lenient tail: truncated/corrupt blobs never throw, keep the prefix") {
    val good = rec("http://a", "hello")
    val truncations = (0 until good.length * 2).map { n =>
      (good + rec("http://b", "world")).take(good.length + n)
    }
    for (t <- truncations) {
      val out = parse(t) // must not throw
      assert(out.nonEmpty && out.head._2 == "http://a")
    }
    // pure garbage → zero records, no throw
    assert(parse("HTTP/1.1 200 OK\r\n\r\nnot a warc").isEmpty)
    assert(parse("").isEmpty)
    // declared length past the end → record dropped, prefix kept
    assert(parse(good + "WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort")
      .map(_._4) == Seq("hello"))
  }

  test("gzip members: roundtrip, cross-member reads, corrupt -> null") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def gunzipped(b: Array[Byte]): Option[String] =
      Seq(Tuple1(b)).toDF("b").select(Gzip.gunzip(col("b")).as("o"))
        .collect().headOption.flatMap(r =>
          if (r.isNullAt(0)) None
          else Some(new String(r.getAs[Array[Byte]](0), "UTF-8")))
    // engine gzip -> engine gunzip identity
    val rt = Seq(Tuple1("hello warc".getBytes("UTF-8"))).toDF("b")
      .select(Gzip.gunzip(Gzip.gzip(col("b"))).as("o"))
      .collect().head.getAs[Array[Byte]](0)
    assert(new String(rt, "UTF-8") == "hello warc")
    // concatenated members read as one stream (the .warc.gz layout)
    assert(gunzipped(gz("abc") ++ gz("def")).contains("abcdef"))
    // corrupt/truncated streams yield null, never a thrown task
    assert(gunzipped("not gzip at all".getBytes("UTF-8")).isEmpty)
    assert(gunzipped(gz("abcdefgh").dropRight(3)).isEmpty)
    // a complete member followed by a JUNK TAIL is poison too — the JDK
    // stream would return a silently truncated "abc" here (no quarantine
    // signal); the member-walk contract nulls the whole blob
    assert(gunzipped(gz("abc") ++ "junk tail!".getBytes("UTF-8")).isEmpty)
    // ... including a tail that STARTS like a member but dies mid-header
    assert(gunzipped(gz("abc") ++ Array[Byte](0x1f, 0x8b.toByte, 8)).isEmpty)
    // a flipped content byte breaks the member CRC -> null
    val bad = gz("abcdefgh")
    bad(12) = (bad(12) ^ 0x7f).toByte
    assert(gunzipped(bad).isEmpty)
    // empty input is malformed (zero members), not an empty payload
    assert(gunzipped(Array.emptyByteArray).isEmpty)
    // ALL-ZERO pad tail after the last member is tape/block padding some
    // producers append — tolerated (valid leading records survive) ...
    assert(gunzipped(gz("abc") ++ Array.fill[Byte](37)(0)).contains("abc"))
    assert(gunzipped(gz("abc") ++ gz("def") ++ Array.fill[Byte](512)(0))
      .contains("abcdef"))
    // ... but any NONZERO junk in the tail still poisons the whole blob,
    // and an all-zero BLOB has no member at all — malformed
    assert(gunzipped(gz("abc") ++ Array.fill[Byte](8)(0) ++ Array[Byte](7))
      .isEmpty)
    assert(gunzipped(Array.fill[Byte](64)(0)).isEmpty)
    // FNAME/FCOMMENT/FEXTRA-bearing headers still parse (offset walk)
    val full = {
      val bos = new java.io.ByteArrayOutputStream()
      // hand-build: magic, deflate, FLG=FEXTRA|FNAME|FCOMMENT, mtime, xfl, os
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
        0, 0, 0, 0, 0, 0))
      bos.write(Array[Byte](3, 0, 9, 9, 9)) // FEXTRA len=3 + payload
      bos.write("name.txt".getBytes("UTF-8")); bos.write(0) // FNAME
      bos.write("a comment".getBytes("UTF-8")); bos.write(0) // FCOMMENT
      val raw = "with headers".getBytes("UTF-8")
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val db = new Array[Byte](256)
      val n = d.deflate(db); d.end()
      bos.write(db, 0, n)
      val crc = new java.util.zip.CRC32(); crc.update(raw)
      def le32(v: Long): Array[Byte] = Array(v, v >> 8, v >> 16, v >> 24)
        .map(x => (x & 0xff).toByte)
      bos.write(le32(crc.getValue)); bos.write(le32(raw.length.toLong))
      bos.toByteArray
    }
    assert(gunzipped(full).contains("with headers"))
    assert(gunzipped(full ++ gz("+more")).contains("with headers+more"))
  }

  test("multi-byte payloads frame by BYTES, not chars") {
    val payload = "héllo→" // 6 chars, more bytes
    val blob = rec("http://u", payload) + rec("http://v", "after")
    val out = parse(blob)
    assert(out.map(_._4) == Seq(payload, "after"))
    assert(out.head._3 == payload.getBytes("UTF-8").length.toLong)
  }
}
