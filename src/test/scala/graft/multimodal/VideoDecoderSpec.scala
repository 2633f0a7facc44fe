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
}
