package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RIFF/AVI codec contract ([[AviCodec]]): real container walk, real JDK
  * JPEG codec for MJPG payloads, exact integer round-trip for DIB
  * payloads, never-throw tolerance, and the chain/kernel integration.
  * The load-bearing claim for the `cv_video_avi` oracle row is
  * MASK-EXACTNESS: max-quality grayscale JPEG error stays far inside the
  * 96-gray-level binarization margin, so the thresholded dark mask (and
  * every moment statistic over it) is bit-identical to the planted
  * raster. That claim is pinned PER PIXEL here, not assumed. */
class AviCodecSpec extends SparkSpec {
  import spark.implicits._

  private def plantedPlanes(id: Long): (Int, Int, Seq[Array[Byte]]) = {
    // the single-sourced oracle-bearing raster, NOT a copy of its loop
    val (nf, planes) = VisionFixtures.videoPlanes(id)
    (48, nf, planes)
  }

  test("DIB: exact integer round-trip through the real container walk") {
    val (w, nf, planes) = plantedPlanes(5L)
    val avi = AviCodec.encodeDibGray(w, w, planes)
    val frames = AviCodec.decode(avi).get
    assert(frames.length == nf)
    frames.zip(planes).foreach { case (g, plane) =>
      assert(g.w == w && g.h == w)
      // palette(v) = (v,v,v): luma = 0.299v+0.587v+0.114v, the exact
      // expression lumaPixels computes — compare bit-for-bit
      plane.zipWithIndex.foreach { case (p, i) =>
        val v = p & 0xff
        assert(g.px(i) == 0.299 * v + 0.587 * v + 0.114 * v,
          s"pixel $i: ${g.px(i)} != $v")
      }
    }
  }

  test("MJPG: decode == direct ImageIO decode; dark mask == planted raster, per pixel") {
    for (id <- Seq(0L, 3L, 7L, 11L)) {
      val (w, nf, planes) = plantedPlanes(id)
      val jpegs = planes.map(p => AviCodec.jpegGray(w, w, p))
      val avi = AviCodec.encode(w, w, jpegs, "MJPG")
      val frames = AviCodec.decode(avi).get
      assert(frames.length == nf, s"id=$id")
      frames.zipWithIndex.foreach { case (g, f) =>
        // 1. container transparency: the walk hands the codec the exact
        // payload — decoded pixels == ImageIO over the raw JPEG bytes
        val direct = VisionOps.grayOf(
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpegs(f))))
        assert(g.w == direct.w && g.h == direct.h &&
          g.px.sameElements(direct.px), s"id=$id frame=$f payload drift")
        // 2. the oracle-carrying claim: lossy error never crosses the
        // binarization threshold — mask == planted, every pixel
        var i = 0
        while (i < g.px.length) {
          val plantedDark = (planes(f)(i) & 0xff) == VisionFixtures.Dark
          assert((g.px(i) < VisionOps.DarkThreshold) == plantedDark,
            s"id=$id frame=$f px=$i: JPEG error crossed the threshold " +
              s"(decoded ${g.px(i)}, planted ${planes(f)(i) & 0xff})")
          i += 1
        }
      }
    }
  }

  test("strided walk decodes only sampled frames, framing validated for all") {
    val (w, _, planes) = plantedPlanes(2L) // videoParams(2): nf = 4
    // force a longer sequence for a meaningful stride
    val many = (planes ++ planes ++ planes).take(7)
    assert(many.length == 7)
    val avi = AviCodec.encode(w, w, many.map(p => AviCodec.jpegGray(w, w, p)),
      "MJPG")
    val full = AviCodec.decode(avi).get
    val strided = AviCodec.decodeStrided(avi, 3).get.toSeq
    assert(strided.map(_._1) == Seq(0, 3, 6))
    strided.foreach { case (f, g) => assert(g.px.sameElements(full(f).px)) }
    // a corrupt SKIPPED body goes unnoticed by design (framing trusted);
    // a corrupt frame LENGTH fails the whole blob
    val bad = avi.clone()
    // find the second video chunk and break its length field hard
    val movi = { var o = 12
      while (!(new String(bad, o, 4, "US-ASCII") == "LIST" &&
        new String(bad, o + 8, 4, "US-ASCII") == "movi")) o += 1
      o }
    val c1 = movi + 12 // first chunk header
    val len1 = java.nio.ByteBuffer.wrap(bad, c1 + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val c2 = c1 + 8 + len1 + (len1 & 1)
    java.nio.ByteBuffer.wrap(bad, c2 + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue - 7)
    assert(AviCodec.decodeStrided(bad, 3).isEmpty &&
      AviCodec.decode(bad).isEmpty)
  }

  test("top-down DIB (negative biHeight) honors the sign instead of flipping") {
    val (w, nf, planes) = plantedPlanes(6L)
    val avi = AviCodec.encodeDibGray(w, w, planes)
    val bottomUp = AviCodec.decode(avi).get
    // flip biHeight's sign in the strf BITMAPINFOHEADER (biHeight at
    // header+8, little-endian); the stored rows are unchanged, so a
    // sign-honoring decoder must return the VERTICAL MIRROR of the
    // bottom-up read — a sign-dropping decoder would silently return
    // the unmirrored frames (the exact corruption this pins against)
    val td = avi.clone()
    val strf = { var o = 0
      while (new String(td, o, 4, "US-ASCII") != "strf") o += 1
      o }
    val hdr = strf + 8 // BITMAPINFOHEADER start
    val h0 = java.nio.ByteBuffer.wrap(td, hdr + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(h0 == w, "unexpected biHeight in fixture")
    java.nio.ByteBuffer.wrap(td, hdr + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-h0)
    val topDown = AviCodec.decode(td).get
    assert(topDown.length == nf)
    topDown.zip(bottomUp).foreach { case (t, bu) =>
      for (y <- 0 until w; x <- 0 until w)
        assert(t.px(y * w + x) == bu.px((w - 1 - y) * w + x),
          s"($x,$y): top-down decode is not the vertical mirror")
    }
  }

  test("OpenDML: frames in RIFF AVIX extension elements are decoded, not dropped") {
    val (w, _, planes) = plantedPlanes(3L)
    val seg1 = planes
    val seg2: Seq[Array[Byte]] =
      planes.map(_.map(b => (255 - (b & 0xff)).toByte))
    val base = AviCodec.encodeDibGray(w, w, seg1)
    // splice the second segment's movi (copied verbatim from its own
    // valid mux) into a RIFF AVIX extension element appended to base —
    // the >1 GB multi-segment layout. All frames must come back: a
    // first-movi-only walk would return seg1 alone as a SILENT partial.
    val donor = AviCodec.encodeDibGray(w, w, seg2)
    val movi = { var o = 12
      while (!(new String(donor, o, 4, "US-ASCII") == "LIST" &&
        new String(donor, o + 8, 4, "US-ASCII") == "movi")) o += 1
      o }
    val moviSz = java.nio.ByteBuffer.wrap(donor, movi + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val moviAll = donor.slice(movi, movi + 8 + moviSz + (moviSz & 1))
    val avixPayload = "AVIX".getBytes ++ moviAll
    val avixHdr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(avixPayload.length).array()
    val multi = base ++ avixHdr ++ avixPayload
    val frames = AviCodec.decode(multi).get
    assert(frames.length == seg1.length + seg2.length,
      s"AVIX segment dropped: got ${frames.length}")
    // seg2's inverted pixels prove the tail frames are the AVIX ones
    val lumaOf = (v: Int) => 0.299 * v + 0.587 * v + 0.114 * v
    frames.takeRight(seg2.length).zip(seg2).foreach { case (g, plane) =>
      plane.zipWithIndex.foreach { case (p, i) =>
        assert(g.px(i) == lumaOf(p & 0xff), s"AVIX pixel $i drifted")
      }
    }
    // strided decode walks the extension too (global frame indices)
    val strided = AviCodec.decodeStrided(multi, 2).get.toSeq
    assert(strided.map(_._1) ==
      (0 until seg1.length + seg2.length by 2).toSeq)
  }

  test("tolerance: bad magic defers, corrupt structure fails to None, never throws") {
    assert(AviCodec.decode(null).isEmpty)
    assert(AviCodec.decode(Array[Byte]()).isEmpty)
    assert(AviCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty) // a WAV, not ours
    val (w, _, planes) = plantedPlanes(2L)
    val avi = AviCodec.encodeDibGray(w, w, planes)
    // truncation through the headers or the frame data must give None,
    // not an exception
    for (cut <- Seq(4, 11, 12, 40, 100, avi.length / 2))
      assert(AviCodec.decode(avi.take(cut)).isEmpty, s"cut=$cut")
    // a cut inside the TRAILING idx1 index leaves hdrl+movi intact and
    // decodes fully — the walk never relies on the optional index
    assert(AviCodec.decode(avi.take(avi.length - 3)).exists(_.length ==
      planes.length))
    // deterministic byte-flip fuzz over the header region
    val rng = new scala.util.Random(1234)
    for (_ <- 0 until 200) {
      val b = avi.clone()
      b(rng.nextInt(math.min(b.length, 400))) = rng.nextInt(256).toByte
      AviCodec.decode(b) // any Option is fine; throwing is the failure
    }
  }

  test("default chain dispatches AVI after GRVD/GPNV; kernels see it unchanged") {
    val (_, nf, _) = plantedPlanes(4L)
    val avi = VisionFixtures.renderVideoAvi(4L)
    val dib = VisionFixtures.renderVideoAviDib(4L)
    def mediaDf(bytes: Array[Byte]) =
      Seq((4L, bytes, ("video/avi", 48, 48, nf)))
        .toDF("media_id", "bytes", "m")
        .select(col("media_id"), col("bytes"),
          struct(col("m._1").as("format"), col("m._2").as("width"),
            col("m._3").as("height"), col("m._4").as("n_frames")).as("meta"))
    // the same detection rows through the lossy and the exact container:
    // mask-exactness makes them IDENTICAL
    val viaMjpg = VisionOps.detectPupilsVideo(mediaDf(avi))
      .orderBy("frame_index").collect().map(_.toString).toSeq
    val viaDib = VisionOps.detectPupilsVideo(mediaDf(dib))
      .orderBy("frame_index").collect().map(_.toString).toSeq
    assert(viaMjpg.nonEmpty && viaMjpg.length == nf && viaMjpg == viaDib)
    // GRVD/GPNV blobs still dispatch to their own decoders (sniff order)
    assert(VideoDecoder.Avi.frames(
      VisionFixtures.renderVideo(4L)).isEmpty)
    assert(VideoDecoder.Avi.frames(
      VisionFixtures.renderVideoPng(4L)).isEmpty)
  }
}
