package graft.multimodal

import graft.SparkSpec
import graft.multimodal.VisionOps.Gray
import org.apache.spark.sql.functions._

/** The decoder-injection seam (docs/CODEC.md): a third, synthetic
  * container joins the dispatch by implementing the one-method trait —
  * no kernel, schema, or partitioning change — and the default chain
  * keeps the GRVD → GPNV order the engine has always used. */
class VideoDecoderSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic FFI stand-in: `TSTV | n` followed by n bytes; frame i is
    * an 8×8 plane of constant value bytes(i) with a 3×3 dark pupil at
    * (2..4, 2..4). Decodes lazily like a native demuxer would. */
  object TstvDecoder extends VideoDecoder {
    def encode(vals: Seq[Int]): Array[Byte] =
      ("TSTV" + vals.length.toChar).getBytes("ISO-8859-1") ++
        vals.map(_.toByte)
    def frames(bytes: Array[Byte]): Option[Iterator[Gray]] = {
      if (bytes == null || bytes.length < 5 ||
          new String(bytes.take(4), "ISO-8859-1") != "TSTV") return None
      val n = bytes(4).toInt
      if (bytes.length < 5 + n) return None
      Some((0 until n).iterator.map { i =>
        val v = (bytes(5 + i) & 0xff).toDouble
        val px = Array.fill(64)(v)
        for (y <- 2 to 4; x <- 2 to 4) px(y * 8 + x) = 0.0
        Gray(8, 8, px)
      })
    }
  }

  def media(id: Long, bytes: Array[Byte]) =
    Seq((id, bytes, ("video/x-test", 8, 8, 2))).toDF("media_id", "bytes", "m")
      .select(col("media_id"), col("bytes"),
        struct(col("m._1").as("format"), col("m._2").as("width"),
          col("m._3").as("height"), col("m._4").as("n_frames")).as("meta"))

  test("an injected decoder flows through detectPupilsVideo unchanged") {
    val chain = VideoDecoder.Chain(
      TstvDecoder +: Seq(VideoDecoder.Grvd, VideoDecoder.Gpnv))
    val df = media(7L, TstvDecoder.encode(Seq(200, 250)))
    val out = VisionOps.detectPupilsVideo(df, decoder = chain)
      .orderBy("frame_index").collect()
    assert(out.length == 2)
    // the planted 3×3 dark block is the pupil in both frames
    out.zipWithIndex.foreach { case (r, f) =>
      assert(r.getAs[Int]("frame_index") == f)
      assert(r.getAs[Long]("n_dark") == 9L)
      assert(r.getAs[Double]("center_x") == 3.0 &&
        r.getAs[Double]("center_y") == 3.0)
    }
    // the default chain does not know the container → zero rows
    assert(VisionOps.detectPupilsVideo(df).collect().isEmpty)
  }

  test("default chain dispatches GRVD before GPNV and sniffs exactly") {
    val grvd = MultimodalOps.encodeRawVideo(2, 2,
      Seq(Array[Byte](1, 2, 3, 4)))
    val g = VideoDecoder.default.frames(grvd).get.toSeq
    assert(g.length == 1 && g.head.w == 2 && g.head.px.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0))
    assert(VideoDecoder.Gpnv.frames(grvd).isEmpty)
    assert(VideoDecoder.default.frames("junk".getBytes).isEmpty)
    assert(VideoDecoder.default.frames(null).isEmpty)
  }

  test("framesStrided == full decode + filter on both containers") {
    def keyOf(fs: Iterator[(Int, Gray)]) =
      fs.map { case (i, g) => (i, g.w, g.h, g.px.toSeq) }.toSeq
    val grvd = MultimodalOps.encodeRawVideo(2, 2,
      (0 until 7).map(f => Array[Byte](f.toByte, 1, 2, 3)))
    val gpnv = VisionFixtures.renderVideoLongPng(3L)
    for (blob <- Seq(grvd, gpnv); stride <- Seq(1, 2, 3, 5)) {
      val fast = keyOf(VideoDecoder.default.framesStrided(blob, stride).get)
      val slow = keyOf(VideoDecoder.default.frames(blob).get.zipWithIndex
        .collect { case (g, i) if i % stride == 0 => (i, g) })
      assert(fast == slow, s"stride=$stride mismatch")
      assert(fast.nonEmpty && fast.map(_._1).forall(_ % stride == 0))
    }
    // a skip-capable decoder that is not the blob's container still sniffs
    assert(VideoDecoder.Gpnv.framesStrided(grvd, 2).isEmpty)
    assert(VideoDecoder.default.framesStrided("junk".getBytes, 2).isEmpty)
    assert(VideoDecoder.default.framesStrided(null, 2).isEmpty)
  }

  test("strided GPNV skips corrupt UNSAMPLED bodies, fails corrupt lengths") {
    // build a GPNV of 3 identical single-frame PNGs, then trash frame 1's
    // BODY (its IHDR chunk-length bytes — decode fails fast, walk intact)
    val png = MultimodalOps.decodePngVideoStrided(
      VisionFixtures.renderVideoLongPng(2L), 1).get.toSeq
    assert(png.nonEmpty)
    val one = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(png.head._2, "png", buf); buf.toByteArray
    }
    val blob = MultimodalOps.encodePngVideo(Seq(one, one, one))
    // frame layout: 8-byte header, then (4+len) per frame
    val corrupt = blob.clone()
    val f1Off = 8 + 4 + one.length + 4 + 10
    corrupt(f1Off) = 0x7f; corrupt(f1Off + 1) = 0x7f
    // stride 2 samples frames 0 and 2 — the corrupt body in frame 1 is
    // seeked past and tolerated (the documented trade)
    assert(MultimodalOps.decodePngVideoStrided(corrupt, 2).isDefined)
    // stride 1 tries to DECODE frame 1 → whole blob rejected
    assert(MultimodalOps.decodePngVideoStrided(corrupt, 1).isEmpty)
    // corrupt LENGTH fails the walk at any stride
    val badLen = blob.clone()
    badLen(8 + 4 + one.length) = -1 // frame 1's length field low byte
    badLen(8 + 4 + one.length + 1) = -1
    badLen(8 + 4 + one.length + 2) = -1
    badLen(8 + 4 + one.length + 3) = -1
    assert(MultimodalOps.decodePngVideoStrided(badLen, 2).isEmpty)
  }
}
