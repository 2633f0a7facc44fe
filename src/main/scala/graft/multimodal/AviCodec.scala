package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Zero-dependency RIFF/AVI video codec — the REAL-container tier of the
  * [[VideoDecoder]] chain.
  *
  * The reference ingests real video containers in 4 GB batches
  * (pupil_detection_pl.py:94-112 and marker_detection.py:98-117 both
  * `cv2.VideoCapture` an .mp4 and iterate frames); the JVM ships no
  * H.264, so the closest fully-public, fully-decodable real container is
  * AVI: RIFF framing (the same chunk grammar [[AudioOps.decodeWav]]
  * already walks for WAV) around per-frame payloads the JDK CAN decode —
  *
  *  - '''MJPG''' (motion JPEG): each `00dc` chunk is one complete JPEG,
  *    decoded through the real `javax.imageio` JPEG codec. This is a
  *    genuine lossy-codec path — the first in the engine — and the
  *    container countless eye trackers and webcams actually emit.
  *  - '''DIB''' (uncompressed device-independent bitmap, biCompression
  *    = 0): each `00db`/`00dc` chunk is a bottom-up, 4-byte-row-aligned
  *    raster — 8-bit palettized or 24-bit BGR — with exact integer
  *    round-trips, so the closed-form raster oracles survive unchanged.
  *
  * Parsing is tolerant by contract (never throw): bad magic → not ours
  * (`None` lets the next chain member sniff); RIFF/AVI magic but corrupt
  * structure, truncated chunks, or an undecodable frame body → `None`
  * for the whole blob (the [[VideoDecoder.Gpnv]] rule — a half-decoded
  * video is a silent data error, not a partial success). Unknown chunks
  * and LISTs are skipped by their declared size, so files carrying
  * extra streams, `JUNK` padding, or vendor chunks still walk.
  *
  * The strided walk decodes ONLY sampled frames: video chunk framing is
  * validated for every frame (lengths, ids), but skipped bodies are
  * seeked past — decode cost proportional to frames KEPT (the
  * [[VideoDecoder.framesStrided]] scale contract; for MJPEG every frame
  * is a keyframe, so any stride lands on a decodable frame).
  */
object AviCodec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Everything a frame decode needs from the header walk. */
  private final case class VideoStream(
      streamNo: Int, isMjpg: Boolean, width: Int, height: Int,
      bitCount: Int, palette: Array[Int] /* 256 packed RGB, 8-bit only */,
      topDown: Boolean /* DIB biHeight < 0: rows stored top-down */)

  private def fourcc(bytes: Array[Byte], off: Int): String =
    if (off + 4 > bytes.length) ""
    else new String(bytes, off, 4, Ascii)

  private def u32(bytes: Array[Byte], off: Int): Long =
    if (off + 4 > bytes.length) -1L
    else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)

  private def u16(bytes: Array[Byte], off: Int): Int =
    if (off + 2 > bytes.length) -1
    else (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)

  /** Is this blob RIFF/AVI at all? (the 12-byte sniff the chain pays on
    * every non-AVI blob — two fourcc compares). */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Walk the header LISTs for the FIRST `vids` stream's shape.
    * None = structurally corrupt (already sniffed as AVI). */
  private def videoStreamInfo(bytes: Array[Byte]): Option[VideoStream] = {
    // top-level walk: LIST hdrl → per-stream LIST strl → strh + strf
    var off = 12
    var streamNo = 0
    while (off + 8 <= bytes.length) {
      val id = fourcc(bytes, off)
      val sz = u32(bytes, off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "LIST" && fourcc(bytes, off + 8) == "hdrl") {
        // walk inside hdrl
        var o = off + 12
        val end = off + 8 + sz.toInt
        while (o + 8 <= end) {
          val cid = fourcc(bytes, o)
          val csz = u32(bytes, o + 4)
          if (csz < 0 || o + 8 + csz > end) return None
          if (cid == "LIST" && fourcc(bytes, o + 8) == "strl") {
            // strh first, then strf — per the AVI spec
            var so = o + 12
            val send = o + 8 + csz.toInt
            var isVids = false; var handler = ""
            var found: Option[VideoStream] = None
            while (so + 8 <= send && found.isEmpty) {
              val sid = fourcc(bytes, so)
              val ssz = u32(bytes, so + 4)
              if (ssz < 0 || so + 8 + ssz > send) return None
              if (sid == "strh" && ssz >= 8) {
                isVids = fourcc(bytes, so + 8) == "vids"
                handler = fourcc(bytes, so + 12)
              } else if (sid == "strf" && isVids && ssz >= 40) {
                val b = so + 8
                val w = u32(bytes, b + 4).toInt
                val hRaw = u32(bytes, b + 8).toInt
                val bits = u16(bytes, b + 14)
                val comp = fourcc(bytes, b + 16)
                val compN = u32(bytes, b + 16)
                val isMjpg = comp == "MJPG" || handler == "MJPG" ||
                  comp == "mjpg"
                if (w <= 0 || hRaw == 0) return None
                if (!isMjpg && compN != 0) return None // codec we can't run
                if (!isMjpg && bits != 8 && bits != 24) return None
                // DIB frames are stored raw: one frame's padded rows
                // must fit in the blob, or the declared dims are
                // corrupt. Compare by DIVISION — w/h are header-
                // controlled, and the product stride×|h| can wrap not
                // just Int (30000×40000×3B ≈ 3.6e9) but Long too
                // (2e9×2e9×3B ≈ 1.2e19 > Long.MaxValue), which would
                // slip a garbage-dims header past a multiply-form guard.
                if (!isMjpg) {
                  val stride = (w.toLong * (bits / 8) + 3L) & ~3L
                  if (math.abs(hRaw.toLong) > bytes.length / stride)
                    return None
                }
                val pal = new Array[Int](256)
                if (!isMjpg && bits == 8) {
                  val clrUsed0 = u32(bytes, b + 32).toInt
                  val clrUsed = if (clrUsed0 <= 0 || clrUsed0 > 256) 256
                                else clrUsed0
                  if (b + 40 + 4 * clrUsed > send) return None
                  var i = 0
                  while (i < clrUsed) {
                    val p = b + 40 + 4 * i // BGRA quads
                    pal(i) = ((bytes(p + 2) & 0xff) << 16) |
                      ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
                    i += 1
                  }
                }
                // biHeight < 0 = top-down row order (Windows capture
                // stacks emit it); honoring the sign, not dropping it,
                // keeps the never-silently-wrong contract
                found = Some(VideoStream(streamNo, isMjpg, w,
                  math.abs(hRaw), bits, pal, hRaw < 0))
              }
              so += 8 + ssz.toInt + (ssz.toInt & 1)
            }
            if (found.isDefined) return found
            streamNo += 1 // a non-vids stream still consumes a number
          }
          o += 8 + csz.toInt + (csz.toInt & 1)
        }
        return None // hdrl with no decodable vids stream
      }
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** Video-chunk framing walk inside LIST movi: (offset, length) of
    * every `NNdb`/`NNdc` chunk belonging to the video stream, with every
    * chunk header validated. None = corrupt framing. Chunks may sit
    * directly in movi or inside `rec ` LISTs (the interleave grouping
    * some muxers emit). */
  private def videoChunks(bytes: Array[Byte],
                          s: VideoStream): Option[Vector[(Int, Int)]] = {
    val tag = f"${s.streamNo}%02d"
    def walk(from: Int, to: Int,
             acc: Vector[(Int, Int)]): Option[Vector[(Int, Int)]] = {
      var off = from
      var out = acc
      while (off + 8 <= to) {
        val id = fourcc(bytes, off)
        val sz = u32(bytes, off + 4)
        if (sz < 0 || off + 8 + sz > to) return None
        if (id == "LIST" && fourcc(bytes, off + 8) == "rec ") {
          walk(off + 12, off + 8 + sz.toInt, out) match {
            case Some(v) => out = v
            case None => return None
          }
        } else if (id.startsWith(tag) &&
            (id.endsWith("db") || id.endsWith("dc"))) {
          out = out :+ ((off + 8, sz.toInt))
        }
        off += 8 + sz.toInt + (sz.toInt & 1)
      }
      Some(out)
    }
    // Accumulate across ALL movi lists: OpenDML (>1 GB) files carry the
    // tail frames in `RIFF AVIX` extension elements, each with its own
    // movi — stopping at the first movi would return a silent PARTIAL
    // decode of a multi-segment recording, which the never-silently-
    // wrong contract forbids. Descend into AVIX elements; any other
    // top-level chunk skips by size.
    var off = 12
    var out = Vector.empty[(Int, Int)]
    var seenMovi = false
    while (off + 8 <= bytes.length) {
      val id = fourcc(bytes, off)
      val sz = u32(bytes, off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) {
        // a malformed TRAILING chunk after frames were found is the
        // truncated-optional-index tolerance (idx1/JUNK — the walk
        // never relies on it); a malformed frame-bearing element
        // (another RIFF segment, a movi list) is corrupt frame data
        // and must fail the blob, never yield a silent partial
        return if (seenMovi && id != "RIFF" &&
          !(id == "LIST" && fourcc(bytes, off + 8) == "movi")) Some(out)
        else None
      }
      if (id == "LIST" && fourcc(bytes, off + 8) == "movi") {
        walk(off + 12, off + 8 + sz.toInt, out) match {
          case Some(v) => out = v; seenMovi = true
          case None => return None
        }
        off += 8 + sz.toInt + (sz.toInt & 1)
      } else if (id == "RIFF" && fourcc(bytes, off + 8) == "AVIX") {
        off += 12 // walk the extension element's own chunk sequence
      } else {
        off += 8 + sz.toInt + (sz.toInt & 1)
      }
    }
    if (seenMovi) Some(out) else None
  }

  /** Decode one frame body to a luma plane. */
  private def decodeFrame(bytes: Array[Byte], off: Int, len: Int,
                          s: VideoStream): Option[VisionOps.Gray] =
    if (s.isMjpg) {
      val body = new Array[Byte](len)
      System.arraycopy(bytes, off, body, 0, len)
      MultimodalOps.decodeImage(body).map(VisionOps.grayOf)
    } else {
      // uncompressed DIB: bottom-up rows (top-down when biHeight was
      // negative), each padded to 4 bytes
      val bytesPerPx = s.bitCount / 8
      val rowStride = (s.width * bytesPerPx + 3) & ~3
      if (len.toLong < rowStride.toLong * s.height) None
      else {
        val px = new Array[Double](s.width * s.height)
        var y = 0
        while (y < s.height) {
          val srcY = if (s.topDown) y else s.height - 1 - y
          val row = off + srcY * rowStride
          var x = 0
          while (x < s.width) {
            if (s.bitCount == 8) {
              val rgb = s.palette(bytes(row + x) & 0xff)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              px(y * s.width + x) = 0.299 * r + 0.587 * g + 0.114 * b
            } else { // 24-bit BGR
              val p = row + 3 * x
              val b = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff
              val r = bytes(p + 2) & 0xff
              px(y * s.width + x) = 0.299 * r + 0.587 * g + 0.114 * b
            }
            x += 1
          }
          y += 1
        }
        Some(VisionOps.Gray(s.width, s.height, px))
      }
    }

  /** Structural metadata — (codec, width, height, nFrames) — without
    * decoding a single frame body: the stream-header parse plus the
    * movi chunk-HEADER walk (every chunk's framing is validated, bodies
    * are never read). The AVI arm of the mixed-corpus listing tier. */
  def meta(bytes: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (!sniff(bytes)) None
    else try {
      for {
        s <- videoStreamInfo(bytes)
        chunks <- videoChunks(bytes, s)
      } yield ((if (s.isMjpg) "MJPG" else s"DIB${s.bitCount}"),
        s.width, s.height, chunks.length)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Full decode: every video frame as a luma plane. None = not AVI or
    * corrupt (never throws — the [[VideoDecoder]] contract). */
  def decode(bytes: Array[Byte]): Option[Seq[VisionOps.Gray]] =
    if (!sniff(bytes)) None
    else try {
      for {
        s <- videoStreamInfo(bytes)
        chunks <- videoChunks(bytes, s)
        frames <- chunks.foldLeft(
            Option(Vector.empty[VisionOps.Gray])) { (accOpt, c) =>
          accOpt.flatMap(acc => decodeFrame(bytes, c._1, c._2, s).map(acc :+ _))
        }
      } yield frames
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Strided decode: framing validated for EVERY chunk (the
    * [[videoChunks]] walk is the container contract), codec run only on
    * sampled frames. */
  def decodeStrided(bytes: Array[Byte],
                    stride: Int): Option[Iterator[(Int, VisionOps.Gray)]] =
    if (!sniff(bytes)) None
    else try {
      for {
        s <- videoStreamInfo(bytes)
        chunks <- videoChunks(bytes, s)
        sampled <- chunks.zipWithIndex
          .collect { case (c, f) if f % stride == 0 => (c, f) }
          .foldLeft(Option(Vector.empty[(Int, VisionOps.Gray)])) {
            case (accOpt, ((off, len), f)) => accOpt.flatMap(acc =>
              decodeFrame(bytes, off, len, s).map(g => acc :+ ((f, g))))
          }
      } yield sampled.iterator
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------- encoders
  // (fixture/test muxers — production media arrives as bytes; these exist
  // so specs and planted fixtures exercise the REAL parse path)

  private def bb(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = bb(8 + body.length + (body.length & 1))
    out.put(id.getBytes(Ascii)).putInt(body.length).put(body)
    out.array()
  }

  private def list(subtype: String, body: Array[Byte]): Array[Byte] = {
    val out = bb(12 + body.length + (body.length & 1))
    out.put("LIST".getBytes(Ascii)).putInt(4 + body.length)
      .put(subtype.getBytes(Ascii)).put(body)
    out.array()
  }

  /** Mux frame payloads into a minimal, spec-valid AVI (one video
    * stream, `avih` + `strl` headers, `movi` data, `idx1` index).
    * `compression` = "MJPG" (payloads are complete JPEGs) or "" (DIB:
    * payloads are already padded bottom-up rasters, `bitCount` 8 with
    * the grayscale palette, or 24). */
  def encode(w: Int, h: Int, payloads: Seq[Array[Byte]],
             compression: String, bitCount: Int = 24,
             fps: Int = 30): Array[Byte] = {
    val isMjpg = compression == "MJPG"
    require(isMjpg || bitCount == 8 || bitCount == 24,
      s"DIB bitCount must be 8 or 24, got $bitCount")
    val n = payloads.length
    val maxLen = if (n == 0) 0 else payloads.map(_.length).max

    val avih = bb(56)
    avih.putInt(1000000 / fps).putInt(maxLen * fps).putInt(0)
      .putInt(0x10 /* AVIF_HASINDEX */).putInt(n).putInt(0).putInt(1)
      .putInt(maxLen).putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)

    val strh = bb(56)
    strh.put("vids".getBytes(Ascii))
      .put((if (isMjpg) "MJPG" else "DIB ").getBytes(Ascii))
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(fps)
      .putInt(0).putInt(n).putInt(maxLen).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)

    val palBytes = if (!isMjpg && bitCount == 8) 256 * 4 else 0
    val strf = bb(40 + palBytes)
    strf.putInt(40).putInt(w).putInt(h).putShort(1)
      .putShort(bitCount.toShort)
    if (isMjpg) strf.put("MJPG".getBytes(Ascii))
    else strf.putInt(0) // BI_RGB: uncompressed is the INTEGER zero
    strf.putInt(if (isMjpg) maxLen else ((w * bitCount / 8 + 3) & ~3) * h)
      .putInt(0).putInt(0).putInt(if (palBytes > 0) 256 else 0).putInt(0)
    var i = 0
    while (i < palBytes / 4) { // grayscale palette, BGRA quads
      strf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++
        chunk("strf", strf.array())))

    val ckid = if (isMjpg) "00dc" else "00db"
    val frameChunks = payloads.map(chunk(ckid, _))
    val movi = list("movi", frameChunks.flatten.toArray)

    // idx1: offsets relative to the 'movi' fourcc position
    val idx = bb(16 * n)
    var off = 4
    payloads.foreach { p =>
      idx.put(ckid.getBytes(Ascii)).putInt(0x10 /* KEYFRAME */)
        .putInt(off).putInt(p.length)
      off += 8 + p.length + (p.length & 1)
    }
    val body = hdrl ++ movi ++ chunk("idx1", idx.array())
    val out = bb(12 + body.length)
    out.put("RIFF".getBytes(Ascii)).putInt(4 + body.length)
      .put("AVI ".getBytes(Ascii)).put(body)
    out.array()
  }

  /** Gray planes → 8-bit palettized DIB payloads → AVI (exact integer
    * round-trip: palette(i) = (i,i,i), Rec.601 of equal channels = i). */
  def encodeDibGray(w: Int, h: Int, planes: Seq[Array[Byte]],
                    fps: Int = 30): Array[Byte] = {
    val rowStride = (w + 3) & ~3
    val payloads = planes.map { plane =>
      require(plane.length == w * h, "frame plane size mismatch")
      val body = new Array[Byte](rowStride * h)
      var y = 0
      while (y < h) {
        System.arraycopy(plane, y * w, body, (h - 1 - y) * rowStride, w)
        y += 1
      }
      body
    }
    encode(w, h, payloads, compression = "", bitCount = 8, fps = fps)
  }

  /** JPEG-encode a gray plane at an explicit quality (the JDK's default
    * writer param) — the fixture/spec path into [[encode]]("MJPG").
    * TYPE_BYTE_GRAY keeps the stream single-component (no chroma
    * subsampling), which is both what eye-tracker MJPEG emits and the
    * best-behaved case for the lossy round-trip. */
  def jpegGray(w: Int, h: Int, plane: Array[Byte],
               quality: Float = 1.0f): Array[Byte] = {
    require(plane.length == w * h, "frame plane size mismatch")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, plane)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }
}
