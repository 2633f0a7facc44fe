package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzz of the decoder contract (VideoDecoder.scala: "tolerant of
  * truncated/corrupt bytes — return None, never throw") and of the full
  * video operators above it: mutated GRVD/GPNV containers must decode to
  * None (or a valid prefix — never garbage dims), and the operators must
  * emit rows only for intact blobs, without ever throwing. */
class VideoDecoderFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Overwrite the i32le at `off` in a copy of `bytes`. */
  private def patched(bytes: Array[Byte], off: Int, v: Int): Array[Byte] = {
    val b = bytes.clone()
    System.arraycopy(le32(v), 0, b, off, 4)
    b
  }

  private val grvdBlob = MultimodalOps.encodeRawVideo(8, 8,
    Seq.tabulate(3)(f => Array.tabulate[Byte](64)(i =>
      (if (i % 8 >= 2 && i % 8 <= 4 && i / 8 >= 2 && i / 8 <= 4) 0
       else 200 + f).toByte)))

  private val gpnvBlob = MultimodalOps.encodePngVideo(
    Seq.tabulate(2)(_ => VisionFixtures.pngBytes(16, 16, invert = false) {
      (x, y) => x >= 5 && x <= 9 && y >= 5 && y <= 9
    }))

  /** Never-throw + sane-output check for one mutated blob. */
  private def decodeSane(bytes: Array[Byte], label: String): Unit = {
    val r = VideoDecoder.default.frames(bytes)
    r.foreach { it =>
      // if a prefix decodes, every produced frame must still be a
      // well-formed plane (positive dims, matching pixel count)
      it.foreach { g =>
        assert(g.w > 0 && g.h > 0 && g.px.length == g.w * g.h,
          s"$label produced a malformed frame")
      }
    }
  }

  private val aviBlob = VisionFixtures.renderVideoAvi(2L)    // MJPG, nf=4
  private val aviDibBlob = VisionFixtures.renderVideoAviDib(2L)
  private val mp4Blob = VisionFixtures.renderVideoMp4(2L)    // jpeg, nf=4
  private val mp4FragBlob = VisionFixtures.renderVideoMp4Frag(2L)

  test("every truncation prefix of both containers decodes to None or a valid prefix") {
    for (blob <- Seq(grvdBlob, gpnvBlob); n <- 0 until blob.length)
      decodeSane(blob.take(n), s"truncate($n)")
    // AVI/mp4 blobs are larger — sample prefixes densely through the
    // headers and sparsely through frame data
    for (blob <- Seq(aviBlob, aviDibBlob, mp4Blob, mp4FragBlob);
         n <- (0 until 300) ++ (300 until blob.length by 37))
      decodeSane(blob.take(n), s"real-container truncate($n)")
    // and the intact blobs still decode fully (the fuzz isn't vacuous)
    assert(VideoDecoder.default.frames(grvdBlob).get.length == 3)
    assert(VideoDecoder.default.frames(gpnvBlob).get.length == 2)
    assert(VideoDecoder.default.frames(aviBlob).get.length == 4)
    assert(VideoDecoder.default.frames(aviDibBlob).get.length == 4)
    assert(VideoDecoder.default.frames(mp4Blob).get.length == 4)
    assert(VideoDecoder.default.frames(mp4FragBlob).get.length == 4)
  }

  test("random byte flips across the whole AVI/mp4 containers never throw (seeded)") {
    val rng = new scala.util.Random(53)
    for (blob <- Seq(aviBlob, aviDibBlob, mp4Blob, mp4FragBlob);
         _ <- 0 until 300) {
      val b = blob.clone()
      val i = rng.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      decodeSane(b, s"real-container flip@$i")
    }
  }

  test("corrupt header fields: zero/negative/overflowing dims and counts never throw") {
    // GRVD header: magic | w@4 | h@8 | n@12
    for (v <- Seq(0, -1, -65536, Int.MaxValue, 65536)) {
      decodeSane(patched(grvdBlob, 4, v), s"grvd w=$v")
      decodeSane(patched(grvdBlob, 8, v), s"grvd h=$v")
      decodeSane(patched(grvdBlob, 12, v), s"grvd n=$v")
      // w*h chosen to overflow Int (65536 * 65536 == 0)
      decodeSane(patched(patched(grvdBlob, 4, 65536), 8, 65536), "grvd w*h overflow")
    }
    // zero dims must be a rejection, not a zero-length plane loop
    assert(VideoDecoder.default.frames(patched(grvdBlob, 4, 0)).isEmpty)
    assert(VideoDecoder.default.frames(patched(grvdBlob, 8, 0)).isEmpty)
    // GPNV header: magic | n@4 | (len@8, png...)
    for (v <- Seq(-1, Int.MaxValue, 1000000)) {
      decodeSane(patched(gpnvBlob, 4, v), s"gpnv n=$v")
      decodeSane(patched(gpnvBlob, 8, v), s"gpnv len=$v")
    }
    assert(VideoDecoder.default.frames(patched(gpnvBlob, 4, -1)).isEmpty)
    assert(VideoDecoder.default.frames(patched(gpnvBlob, 8, -1)).isEmpty)
    // len = 0: a zero-byte "PNG" payload is undecodable → None
    assert(VideoDecoder.default.frames(patched(gpnvBlob, 8, 0)).isEmpty)
  }

  test("random byte flips in the PNG payload never throw (seeded)") {
    val rng = new scala.util.Random(97)
    for (_ <- 0 until 300) {
      val b = gpnvBlob.clone()
      val i = rng.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      decodeSane(b, s"flip@$i")
    }
  }

  // ---- r17 arms: the two OOM-class header regressions + the AVI
  // index/extension surfaces the r16 sweep didn't reach ----

  /** First occurrence of an ASCII fourcc in the blob. */
  private def findTag(blob: Array[Byte], t: String): Int = {
    val tb = t.getBytes("US-ASCII")
    var i = 0
    while (i + 4 <= blob.length) {
      if (blob(i) == tb(0) && blob(i + 1) == tb(1) &&
          blob(i + 2) == tb(2) && blob(i + 3) == tb(3)) return i
      i += 1
    }
    fail(s"fourcc $t not found in fixture blob")
  }

  /** Overwrite a BIG-endian i32 (ISO-BMFF field order) in a copy. */
  private def patchedBE(bytes: Array[Byte], off: Int, v: Int): Array[Byte] = {
    val b = bytes.clone()
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    b
  }

  test("mp4 stsz fixed-size path: hostile sample counts reject before allocation") {
    // stsz payload: version/flags@0, sample_size@4, sample_count@8.
    // sample_size != 0 means NO table backs the count, so the only
    // honest bound is the blob itself — a crafted (size=1,
    // count=0x7FFFFFFF) header must go to None, not tabulate a ~17 GB
    // Array[Long] (OOM is a VirtualMachineError the never-throw
    // handlers cannot catch).
    val p = findTag(mp4Blob, "stsz") + 4
    for ((sz, n) <- Seq((1, Int.MaxValue), (Int.MaxValue, Int.MaxValue),
                        (1000000, 1000000), (1, 1 << 30), (1 << 30, 4))) {
      val b = patchedBE(patchedBE(mp4Blob, p + 4, sz), p + 8, n)
      assert(Mp4Codec.meta(b).isEmpty, s"stsz fixed sz=$sz n=$n accepted")
      assert(Mp4Codec.decode(b).isEmpty)
      decodeSane(b, s"stsz fixed sz=$sz n=$n")
    }
    // a sane fixed-size header must survive the new bound (the samples
    // no longer match real JPEG framing, so decode may refuse — but it
    // must refuse for CONTENT reasons, with metadata still served)
    val sane = patchedBE(patchedBE(mp4Blob, p + 4, 8), p + 8, 4)
    assert(Mp4Codec.meta(sane).nonEmpty,
      "bound rejects a fixed-size table that fits the blob")
    decodeSane(sane, "stsz fixed sane")
  }

  test("AVI DIB: header dims that overflow Int or exceed the blob reject without allocation") {
    // strf chunk body: biSize@0, biWidth@4, biHeight@8 (LE). A crafted
    // 30000x40000 24-bit frame puts rowStride*height at 3.6e9 — wrapping
    // the old Int guard negative and allocating ~9.6 GB of Double. All
    // hostile dims must go to None inside videoStreamInfo.
    val b0 = findTag(aviDibBlob, "strf") + 8
    // includes the LONG-wrap window: 2e9×2e9×3B ≈ 1.2e19 > Long.MaxValue
    // wraps a multiply-form guard negative (the division-form guard is
    // immune), and biHeight = Int.MinValue whose Int abs stays negative
    for ((w, h) <- Seq((30000, 40000), (46341, 46341), (1 << 20, 1 << 20),
                       (0x40000000, 2), (2, 0x40000000),
                       (2000000000, 2000000000), (3, 0x80000000))) {
      val b = patched(patched(aviDibBlob, b0 + 4, w), b0 + 8, h)
      assert(AviCodec.decode(b).isEmpty, s"dims ${w}x$h accepted")
      decodeSane(b, s"dib dims ${w}x$h")
      // negative biHeight (top-down order) with the same magnitude
      val bn = patched(patched(aviDibBlob, b0 + 4, w), b0 + 8, -h)
      assert(AviCodec.decode(bn).isEmpty, s"dims ${w}x-$h accepted")
      decodeSane(bn, s"dib dims ${w}x-$h")
    }
    // the legit fixture still decodes — the bound is not over-tight
    assert(AviCodec.decode(aviDibBlob).get.length == 4)
  }

  test("AVI DIB palette edges: clrUsed 0 / oversized / negative are clamped, never thrown") {
    // biClrUsed@32 in the strf body: 0 means "full palette" per the DIB
    // spec; >256 and negative are hostile. All clamp to a 256-quad read
    // the fixture's palette actually carries, so decode still succeeds
    // bit-identically.
    val b0 = findTag(aviDibBlob, "strf") + 8
    val want = AviCodec.decode(aviDibBlob).get.length
    for (v <- Seq(0, 1, 255, 256, 300, 100000, -1, Int.MinValue)) {
      val b = patched(aviDibBlob, b0 + 32, v)
      decodeSane(b, s"clrUsed=$v")
      assert(AviCodec.decode(b).map(_.length).contains(want),
        s"clrUsed=$v broke the decode")
    }
  }

  test("idx1 index chunk: hostile size fields and shredded bodies never throw") {
    val idx = findTag(aviBlob, "idx1")
    for (v <- Seq(-1, Int.MaxValue, aviBlob.length, 0))
      decodeSane(patched(aviBlob, idx + 4, v), s"idx1 sz=$v")
    // the walk never relies on idx1 CONTENT: a shredded body is benign
    val b = aviBlob.clone()
    var i = idx + 8
    while (i < math.min(b.length, idx + 72)) { b(i) = 0x5a; i += 1 }
    assert(AviCodec.decode(b).get.length == 4,
      "idx1 body corruption changed the frame walk")
  }

  test("OpenDML AVIX extension: truncation fails whole (never a silent partial) and flips never throw") {
    // two-segment OpenDML layout: base AVI + RIFF AVIX carrying a second
    // movi (the >1 GB capture shape), built exactly as AviCodecSpec does
    val donor = aviDibBlob
    val movi = findTag(donor, "movi") - 8
    val moviSz = java.nio.ByteBuffer.wrap(donor, movi + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val moviAll = donor.slice(movi, movi + 8 + moviSz + (moviSz & 1))
    val avixPayload = "AVIX".getBytes("US-ASCII") ++ moviAll
    val avixHdr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(avixPayload.length).array()
    val multi = aviDibBlob ++ avixHdr ++ avixPayload
    val total = AviCodec.decode(multi).get.length
    assert(total == 8, s"fixture mux wrong: $total frames")
    // every truncation point inside the extension element: all-or-None.
    // Exemption: cutting at the segment boundary (or leaving < 8 bytes,
    // below one chunk header) reproduces a self-consistent single-
    // segment AVI / trailing padding — structurally indistinguishable
    // from a file that never had an extension, so tolerance there is
    // correct, not a silent partial.
    for (n <- aviDibBlob.length until multi.length) {
      val r = AviCodec.decode(multi.take(n))
      if (n >= aviDibBlob.length + 8)
        assert(r.isEmpty || r.get.length == total,
          s"truncate($n) returned a silent partial of ${r.map(_.length)}")
      decodeSane(multi.take(n), s"avix truncate($n)")
    }
    // seeded random flips across the whole extension region
    val rng = new scala.util.Random(71)
    for (_ <- 0 until 300) {
      val b = multi.clone()
      val i = aviDibBlob.length + rng.nextInt(multi.length - aviDibBlob.length)
      b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      decodeSane(b, s"avix flip@$i")
    }
  }

  test("full video operators on corrupt blobs: no rows, no throw; intact blob still detects") {
    val rng = new scala.util.Random(31)
    def flipped(blob: Array[Byte], n: Int): Array[Byte] = {
      val b = blob.clone()
      for (_ <- 0 until n) {
        val i = rng.nextInt(b.length)
        b(i) = (b(i) ^ 0xff).toByte
      }
      b
    }
    val rows = Seq[(Long, Array[Byte])](
      1L -> grvdBlob,                              // intact — must detect
      2L -> grvdBlob.take(20),                     // truncated mid-plane
      3L -> patched(grvdBlob, 12, Int.MaxValue),   // impossible frame count
      4L -> gpnvBlob.take(11),                     // truncated mid-length
      5L -> patched(gpnvBlob, 8, -7),              // negative frame length
      6L -> flipped(gpnvBlob, 40),                 // shredded PNG payload
      7L -> Array.empty[Byte],                     // empty blob
      8L -> "not a container at all".getBytes("UTF-8"),
      9L -> mp4Blob.take(40),                      // truncated mp4
      10L -> flipped(mp4FragBlob, 40))             // shredded fragments
    val media = rows.toDF("media_id", "bytes")
    val pupils = VisionOps.detectPupilsVideo(media).collect()
    assert(pupils.nonEmpty && pupils.forall(_.getAs[Long]("media_id") == 1L),
      "corrupt blobs leaked rows or the intact blob went undetected")
    assert(pupils.length == 3) // one row per intact GRVD frame
    val kpts = VisionOps.detectKeypointsVideo(media).collect()
    assert(kpts.nonEmpty && kpts.forall(_.getAs[Long]("media_id") == 1L))
    val markers = VisionOps.detectMarkersVideo(media).collect()
    assert(markers.forall(_.getAs[Long]("media_id") == 1L))
  }
}
