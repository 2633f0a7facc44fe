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
