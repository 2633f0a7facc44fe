package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ISO-BMFF (mp4) codec contract ([[Mp4Codec]]): the box walk resolves
  * every sample's byte range from the `stsc`/`stsz`/`stco` tables, JPEG-
  * coded tracks decode through the JDK's actual codec, ANY codec yields
  * its structural metadata without a sample body being read, and the
  * never-throw tolerance rule holds under truncation and byte-flip fuzz.
  * The load-bearing claim for the `cv_video_mp4` oracle row is the same
  * MASK-EXACTNESS the AVI arm pins: max-quality grayscale JPEG error
  * stays far inside the 96-gray-level binarization margin, so the
  * thresholded dark mask (and every moment statistic over it) is
  * bit-identical to the planted raster — pinned per pixel here. */
class Mp4CodecSpec extends SparkSpec {
  import spark.implicits._

  private def plantedPlanes(id: Long): (Int, Int, Seq[Array[Byte]]) = {
    // the single-sourced oracle-bearing raster, NOT a copy of its loop
    val (nf, planes) = VisionFixtures.videoPlanes(id)
    (48, nf, planes)
  }

  test("jpeg track: decode == direct ImageIO; dark mask == planted raster, per pixel") {
    for (id <- Seq(0L, 3L, 7L, 11L)) {
      val (w, nf, planes) = plantedPlanes(id)
      val jpegs = planes.map(p => AviCodec.jpegGray(w, w, p))
      val mp4 = Mp4Codec.encode(w, w, jpegs)
      val frames = Mp4Codec.decode(mp4).get
      assert(frames.length == nf, s"id=$id")
      frames.zipWithIndex.foreach { case (g, f) =>
        // 1. container transparency: the sample-table walk hands the
        // codec the exact payload — pixels == ImageIO over the raw bytes
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

  test("meta resolves track structure for decodable AND undecodable codecs") {
    val (w, nf, planes) = plantedPlanes(5L)
    val jpegMp4 = Mp4Codec.encode(w, w,
      planes.map(p => AviCodec.jpegGray(w, w, p)))
    val m = Mp4Codec.meta(jpegMp4).get
    assert(m.codec == "jpeg" && m.width == w && m.height == w &&
      m.nSamples == nf && m.timescale == 600 && m.duration == nf * 20L)
    // avc1: full metadata from the moov walk, decode defers honestly —
    // the structural/decode tier split a codec-less JVM must keep
    val avc = VisionFixtures.renderVideoMp4Avc(5L)
    val ma = Mp4Codec.meta(avc).get
    assert(ma.codec == "avc1" && ma.width == w && ma.height == w &&
      ma.nSamples == nf)
    assert(Mp4Codec.decode(avc).isEmpty)
    assert(VideoDecoder.default.frames(avc).isEmpty)
    // meta never touches sample bodies: zero out the mdat payload and
    // the same metadata comes back
    val gutted = avc.clone()
    val mdat = { var o = 0
      while (new String(gutted, o + 4, 4, "US-ASCII") != "mdat") {
        val sz = java.nio.ByteBuffer.wrap(gutted, o, 4).getInt
        o += sz
      }
      o }
    val mdatSz = java.nio.ByteBuffer.wrap(gutted, mdat, 4).getInt
    java.util.Arrays.fill(gutted, mdat + 8, mdat + mdatSz, 0.toByte)
    assert(Mp4Codec.meta(gutted).contains(ma))
  }

  test("strided decode: sample table addresses frames, codec runs on sampled only") {
    val (w, _, planes) = plantedPlanes(2L)
    val many = (planes ++ planes ++ planes).take(7)
    val mp4 = Mp4Codec.encode(w, w, many.map(p => AviCodec.jpegGray(w, w, p)))
    val full = Mp4Codec.decode(mp4).get
    val strided = Mp4Codec.decodeStrided(mp4, 3).get.toSeq
    assert(strided.map(_._1) == Seq(0, 3, 6))
    strided.foreach { case (f, g) => assert(g.px.sameElements(full(f).px)) }
    // a corrupt stsz length fails the whole blob at the WALK, before any
    // decode — the sample table is the validated container contract
    val bad = mp4.clone()
    val stsz = { var o = 0
      while (o + 8 <= bad.length &&
        new String(bad, o + 4, 4, "US-ASCII") != "stsz") o += 1
      o }
    assert(stsz + 8 <= bad.length, "stsz box not found")
    // third sample's size entry → absurd (entries at box+20, v0 full box)
    java.nio.ByteBuffer.wrap(bad, stsz + 8 + 4 + 12 + 4, 4)
      .putInt(Int.MaxValue - 7)
    assert(Mp4Codec.decodeStrided(bad, 3).isEmpty &&
      Mp4Codec.decode(bad).isEmpty)
  }

  test("tolerance: bad magic defers, corrupt structure fails to None, never throws") {
    assert(Mp4Codec.decode(null).isEmpty && !Mp4Codec.sniff(null))
    assert(Mp4Codec.decode(Array[Byte]()).isEmpty)
    assert(Mp4Codec.decode("RIFFxxxxAVI LIST".getBytes).isEmpty) // an AVI, not ours
    val (w, _, planes) = plantedPlanes(2L)
    val mp4 = Mp4Codec.encode(w, w, planes.map(p => AviCodec.jpegGray(w, w, p)))
    // truncation anywhere must give None, not an exception (moov is
    // LAST in the mux, so any cut loses the sample tables)
    for (cut <- Seq(4, 11, 12, 40, 100, mp4.length / 2, mp4.length - 3))
      assert(Mp4Codec.decode(mp4.take(cut)).isEmpty, s"cut=$cut")
    // deterministic byte-flip fuzz over the structural region (moov is
    // at the tail; fuzz both ends)
    val rng = new scala.util.Random(5678)
    for (i <- 0 until 400) {
      val b = mp4.clone()
      val at = if (i % 2 == 0) rng.nextInt(math.min(b.length, 200))
      else b.length - 1 - rng.nextInt(math.min(b.length, 400))
      b(at) = rng.nextInt(256).toByte
      Mp4Codec.decode(b)   // any Option is fine; throwing is the failure
      Mp4Codec.meta(b)
    }
  }

  test("multi-chunk layouts: stsc run expansion matches the single-chunk decode") {
    // real progressive muxers interleave tracks, so samples arrive in
    // MANY chunks with run-length-encoded samples-per-chunk; the
    // expansion walk (run advancement + per-chunk byte walk) must yield
    // exactly the single-chunk frames for any chunking of the same
    // samples — including patterns whose equal neighbors RLE-collapse
    val (w, _, planes) = plantedPlanes(2L)
    val many = (planes ++ planes ++ planes).take(7)
    val jpegs = many.map(p => AviCodec.jpegGray(w, w, p))
    val ref = Mp4Codec.decode(Mp4Codec.encode(w, w, jpegs)).get
    for (pattern <- Seq(Seq(3, 1, 2, 1), Seq(2, 2, 3), Seq(1, 1, 1, 1, 1, 1, 1),
        Seq(7))) {
      assert(pattern.sum == 7)
      val chunks = pattern.foldLeft((jpegs, Vector.empty[Seq[Array[Byte]]])) {
        case ((rest, acc), k) => (rest.drop(k), acc :+ rest.take(k))
      }._2
      val blob = Mp4Codec.encodeChunked(w, w, chunks)
      val got = Mp4Codec.decode(blob).get
      assert(got.length == 7, s"pattern=$pattern: ${got.length} frames")
      got.zip(ref).foreach { case (a, b) =>
        assert(a.px.sameElements(b.px), s"pattern=$pattern frame drift") }
      assert(Mp4Codec.meta(blob).get.nSamples == 7L, s"pattern=$pattern")
    }
  }

  test("large-file shapes: largesize mdat + co64 offsets decode identically") {
    // >4 GB files (the reference's session videos) REQUIRE the 64-bit
    // container shapes; pin the parse paths on a small fixture muxed
    // with them — bit-identical frames, identical metadata, and the
    // mjpa (QuickTime motion-JPEG) tag dispatches like jpeg
    for (tagName <- Seq("jpeg", "mjpa")) {
      val (w, nf, planes) = plantedPlanes(7L)
      val jpegs = planes.map(p => AviCodec.jpegGray(w, w, p))
      val small = Mp4Codec.encode(w, w, jpegs, codecTag = tagName)
      val large = Mp4Codec.encode(w, w, jpegs, codecTag = tagName,
        largeFile = true)
      val a = Mp4Codec.decode(small).get
      val b = Mp4Codec.decode(large).get
      assert(a.length == nf && b.length == nf, s"tag=$tagName")
      a.zip(b).foreach { case (x, y) =>
        assert(x.px.sameElements(y.px), s"tag=$tagName 64-bit path drift") }
      val (ms, ml) = (Mp4Codec.meta(small).get, Mp4Codec.meta(large).get)
      assert(ms == ml && ml.nSamples == nf, s"tag=$tagName meta drift")
    }
  }

  test("fragmented mp4 (moof/trun): decode == progressive, meta counts trun samples") {
    for (id <- Seq(1L, 5L, 9L)) {
      val (w, nf, planes) = plantedPlanes(id)
      val jpegs = planes.map(p => AviCodec.jpegGray(w, w, p))
      val prog = Mp4Codec.encode(w, w, jpegs)
      val frag = Mp4Codec.encodeFragmented(w, w, jpegs, perFrag = 2)
      // the fragmented layout is demux-invisible: same frames, same
      // pixels as the progressive mux of the same samples
      val pf = Mp4Codec.decode(prog).get
      val ff = Mp4Codec.decode(frag).get
      assert(ff.length == nf, s"id=$id: ${ff.length} frames, want $nf")
      pf.zip(ff).foreach { case (a, c) =>
        assert(a.px.sameElements(c.px), s"id=$id fragmented pixels drift")
      }
      // the structural tier counts trun samples (moov tables are empty)
      val m = Mp4Codec.meta(frag).get
      assert(m.codec == "jpeg" && m.nSamples == nf &&
        m.width == w && m.height == w, s"id=$id meta: $m")
      // strided indices are global across fragments
      val strided = Mp4Codec.decodeStrided(frag, 2).get.toSeq
      assert(strided.map(_._1) == (0 until nf by 2).toSeq)
      strided.foreach { case (f, g) => assert(g.px.sameElements(pf(f).px)) }
    }
    // fragmented avc1: trun-counted metadata, honest decode deferral —
    // a moov-only scan would list every streaming capture as 0 frames
    val avcF = VisionFixtures.renderVideoMp4FragAvc(5L)
    val ma = Mp4Codec.meta(avcF).get
    assert(ma.codec == "avc1" &&
      ma.nSamples == VisionFixtures.videoParams(5L)._1)
    assert(Mp4Codec.decode(avcF).isEmpty &&
      VideoDecoder.default.frames(avcF).isEmpty)
  }

  test("fragmented mp4 truncation: mid-structure cuts fail, never a shorter success") {
    val (w, nf, planes) = plantedPlanes(1L)
    assert(nf >= 2, "need >= 2 fragments for the truncation to bite")
    val frag = Mp4Codec.encodeFragmented(w, w,
      planes.map(p => AviCodec.jpegGray(w, w, p)), perFrag = 1)
    // any cut through a trailing fragment (or its header) must fail the
    // WHOLE blob — returning the surviving prefix would be the silent
    // partial decode of a truncated streaming capture
    for (cut <- Seq(frag.length - 3, frag.length - 20,
        frag.length * 3 / 4, frag.length / 2))
      assert(Mp4Codec.decode(frag.take(cut)).isEmpty, s"cut=$cut")
    // byte-flip fuzz across the whole blob (trun tables included)
    val rng = new scala.util.Random(9012)
    for (_ <- 0 until 300) {
      val b = frag.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      Mp4Codec.decode(b); Mp4Codec.meta(b) // throwing is the failure
    }
  }

  test("hardening: trailing junk, corrupt counts, and garbage track ids stay safe") {
    val (w, nf, planes) = plantedPlanes(3L)
    val jpegs = planes.map(p => AviCodec.jpegGray(w, w, p))
    val prog = Mp4Codec.encode(w, w, jpegs)
    val frag = Mp4Codec.encodeFragmented(w, w, jpegs, perFrag = 1)
    val junk = "not-a-box-trailer-SEF".getBytes
    // progressive files keep their tolerance for vendor trailers
    // (Samsung SEF / GoPro appendices) — frames never lived there
    assert(Mp4Codec.decode(prog ++ junk).exists(_.length == nf),
      "trailing junk broke a complete progressive file")
    assert(Mp4Codec.meta(prog ++ junk).exists(_.nSamples == nf))
    // a FRAGMENTED file (mvex declared) stays strict: junk where a
    // fragment could be must fail, not shorter-succeed
    assert(Mp4Codec.decode(frag ++ junk).isEmpty,
      "fragmented file accepted unparseable trailing bytes")
    // a corrupt trun sample_count must fail to None BEFORE allocating
    // (the count is bounded by the trun box's own byte length)
    val badCount = frag.clone()
    val trun = { var o = 0
      while (new String(badCount, o + 4, 4, "US-ASCII") != "trun") o += 1
      o }
    java.nio.ByteBuffer.wrap(badCount, trun + 12, 4).putInt(0x7ffffff0)
    assert(Mp4Codec.decode(badCount).isEmpty &&
      Mp4Codec.meta(badCount).isEmpty)
    // a garbage tkhd track_ID on a moov-empty fragmented file must be
    // None, not a zero-frame SUCCESS (the silent-empty hazard)
    val badTid = frag.clone()
    val tkhd = { var o = 0
      while (new String(badTid, o + 4, 4, "US-ASCII") != "tkhd") o += 1
      o }
    java.nio.ByteBuffer.wrap(badTid, tkhd + 20, 4).putInt(99)
    assert(Mp4Codec.meta(badTid).isEmpty && Mp4Codec.decode(badTid).isEmpty,
      "unmatched fragments + empty moov read as a zero-frame success")
  }

  test("sniff hops leading wide/free padding boxes (QuickTime lineage)") {
    val (w, _, planes) = plantedPlanes(3L)
    val mp4 = Mp4Codec.encode(w, w, planes.map(p => AviCodec.jpegGray(w, w, p)))
    val m = Mp4Codec.meta(mp4).get
    // a `wide` (8-byte) and a `free` box in front of ftyp: still ours —
    // a first-box-only sniff would drop the whole file from the listing
    // tier. The moov walk is offset-tolerant, so meta is unchanged
    // (sample offsets shift but stay in-bounds; meta reads no body).
    val wide = Array[Byte](0, 0, 0, 8) ++ "wide".getBytes
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++
      Array[Byte](1, 2, 3, 4)
    for (prefix <- Seq(wide, free, wide ++ free)) {
      val padded = prefix ++ mp4
      assert(Mp4Codec.sniff(padded), s"prefix ${prefix.length}B rejected")
      assert(Mp4Codec.meta(padded).contains(m),
        s"meta drifted under a ${prefix.length}B prefix")
    }
    // an unknown leading type is still not ours
    assert(!Mp4Codec.sniff(Array[Byte](0, 0, 0, 8) ++ "abcd".getBytes ++ mp4))
    // a zero-size (runs-to-EOF) leading box can't be followed by moov
    assert(!Mp4Codec.sniff(Array[Byte](0, 0, 0, 0) ++ "free".getBytes ++ mp4))
  }

  test("unified videoMeta lists all four containers header-only") {
    import org.apache.spark.sql.Row
    val id = 4L
    val nf = VisionFixtures.videoParams(id)._1
    val blobs = Seq(
      ("grvd", "raw", VisionFixtures.renderVideo(id)),
      ("gpnv", "png", VisionFixtures.renderVideoPng(id)),
      ("avi", "MJPG", VisionFixtures.renderVideoAvi(id)),
      ("avi", "DIB8", VisionFixtures.renderVideoAviDib(id)),
      ("mp4", "jpeg", VisionFixtures.renderVideoMp4(id)),
      ("mp4", "jpeg", VisionFixtures.renderVideoMp4Frag(id)),
      ("mp4", "avc1", VisionFixtures.renderVideoMp4Avc(id)))
    val media = blobs.zipWithIndex.map { case ((_, _, b), i) =>
      (i.toLong, b) }.toDF("media_id", "bytes")
    val rows = MultimodalOps.videoMeta(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == blobs.length, "a container fell out of the listing")
    for (((cont, codec, _), i) <- blobs.zipWithIndex) {
      val r = rows(i.toLong)
      assert(r.getString(1) == cont && r.getString(2) == codec &&
        r.getInt(3) == 48 && r.getInt(4) == 48 && r.getInt(5) == nf,
        s"blob $i ($cont/$codec): $r")
    }
    // (the no-body-read claim is pinned by the mdat-gutting case in the
    // meta test above; GRVD/GPNV walks are header-only by construction)
    // LISTING == DECODE acceptance parity at the edges:
    // 1. a crafted GRVD header whose n*w*h overflows Long must be
    // rejected by BOTH tiers (it once listed as a 2M-frame video)
    val overflow = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("GRVD".getBytes).putInt(2097152).putInt(2097152)
      .putInt(2097152).array()
    assert(MultimodalOps.decodeRawVideo(overflow).isEmpty)
    assert(MultimodalOps.videoMeta(Seq((50L, overflow))
      .toDF("media_id", "bytes")).collect().isEmpty,
      "overflowing GRVD header listed as a valid video")
    // 2. a JPEG-framed GPNV (the container is format-generic on the
    // decode side) must LIST too — one first-frame decode for dims
    val jpegGpnv = MultimodalOps.encodePngVideo(
      Seq(AviCodec.jpegGray(48, 48, Array.fill(48 * 48)(100.toByte)),
          AviCodec.jpegGray(48, 48, Array.fill(48 * 48)(200.toByte))))
    assert(MultimodalOps.decodePngVideo(jpegGpnv).exists(_.length == 2))
    val jr = MultimodalOps.videoMeta(Seq((51L, jpegGpnv))
      .toDF("media_id", "bytes")).collect()
    assert(jr.length == 1 && jr(0).getString(1) == "gpnv" &&
      jr(0).getInt(3) == 48 && jr(0).getInt(4) == 48 &&
      jr(0).getInt(5) == 2, s"jpeg-framed GPNV mislisted: ${jr.toSeq}")
    // 3. a zero-frame GPNV is valid-empty on both tiers: decode yields
    // no frames, the listing prices it at 0×0×0 (documented contract)
    val emptyGpnv = MultimodalOps.encodePngVideo(Seq.empty)
    assert(MultimodalOps.decodePngVideo(emptyGpnv).exists(_.isEmpty))
    val er = MultimodalOps.videoMeta(Seq((52L, emptyGpnv))
      .toDF("media_id", "bytes")).collect()
    assert(er.length == 1 && er(0).getInt(5) == 0 &&
      er(0).getInt(3) == 0 && er(0).getInt(4) == 0)
    // corrupt garbage and truncations never throw and never emit rows
    val junk = Seq((100L, "garbage".getBytes),
      (101L, Array.empty[Byte]),
      (102L, VisionFixtures.renderVideoMp4(id).take(30)))
      .toDF("media_id", "bytes")
    assert(MultimodalOps.videoMeta(junk).collect().isEmpty)
  }

  test("default chain dispatches mp4 last; kernels see the same rows as the AVI arm") {
    val (_, nf, _) = plantedPlanes(4L)
    val mp4 = VisionFixtures.renderVideoMp4(4L)
    val avi = VisionFixtures.renderVideoAvi(4L)
    def mediaDf(bytes: Array[Byte], fmt: String) =
      Seq((4L, bytes, (fmt, 48, 48, nf)))
        .toDF("media_id", "bytes", "m")
        .select(col("media_id"), col("bytes"),
          struct(col("m._1").as("format"), col("m._2").as("width"),
            col("m._3").as("height"), col("m._4").as("n_frames")).as("meta"))
    // mask-exactness holds through BOTH real containers (same JPEG
    // payloads, different demux) — identical detection rows
    val viaMp4 = VisionOps.detectPupilsVideo(mediaDf(mp4, "video/mp4"))
      .orderBy("frame_index").collect().map(_.toString).toSeq
    val viaAvi = VisionOps.detectPupilsVideo(mediaDf(avi, "video/avi"))
      .orderBy("frame_index").collect().map(_.toString).toSeq
    assert(viaMp4.nonEmpty && viaMp4.length == nf && viaMp4 == viaAvi)
    // other containers never reach the mp4 decoder (sniff order), and
    // mp4 bytes defer past the other decoders
    assert(VideoDecoder.Mp4.frames(VisionFixtures.renderVideo(4L)).isEmpty)
    assert(VideoDecoder.Mp4.frames(VisionFixtures.renderVideoPng(4L)).isEmpty)
    assert(VideoDecoder.Mp4.frames(avi).isEmpty)
    assert(VideoDecoder.Avi.frames(mp4).isEmpty)
    assert(VideoDecoder.Grvd.frames(mp4).isEmpty)
    assert(VideoDecoder.Gpnv.frames(mp4).isEmpty)
  }
}
