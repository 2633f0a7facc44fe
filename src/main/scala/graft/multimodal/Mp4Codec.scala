package graft.multimodal

import java.nio.ByteBuffer

/** Zero-dependency ISO-BMFF (MP4/QuickTime) demuxer — the container the
  * reference actually ingests (`world.mp4` / `eye0.mp4`,
  * pupil_detection_pl.py:94-112, marker_detection.py:98-117).
  *
  * Two tiers, split by what the JVM can decode:
  *
  *  - '''Full decode''' for JPEG-coded video tracks (`jpeg`/`mjpa`
  *    sample entries — motion-JPEG-in-MP4, a real QuickTime/camera
  *    lineage): the box walk resolves every sample's byte range from
  *    the `stsc`/`stsz`/`stco` tables and each sample decodes through
  *    the JDK's actual JPEG codec. [[VideoDecoder.Mp4]] rides this.
  *  - '''Metadata scan''' for ANY codec (including `avc1`/H.264, which
  *    the JVM cannot decode): track dimensions, sample count, codec
  *    fourcc, timescale and duration from `stsd`/`stsz`/`mdhd` — the
  *    S1 structural tier a 100 TB listing pass runs BEFORE committing
  *    decode CPU (what to decode, how many frames, at what rate), and
  *    the honest boundary of a codec-less JVM: an H.264 mp4 yields its
  *    full metadata here and `None` from [[decode]], so the decoder
  *    chain defers rather than fabricating frames.
  *
  * Boxes are big-endian (unlike RIFF); 64-bit `largesize` and `co64`
  * chunk offsets are handled; unknown boxes are skipped by size. Same
  * never-throw tolerance contract as [[AviCodec]]: bad magic → not ours
  * (`None`); BMFF magic but corrupt structure → `None` for the blob.
  */
object Mp4Codec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  final case class Meta(codec: String, width: Int, height: Int,
                        nSamples: Long, timescale: Long, duration: Long)

  private def u32(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 8 > b.length) -1L
    else (u32(b, off) << 32) | u32(b, off + 4)

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def tag(b: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off, 4, Ascii)

  /** Is this ISO-BMFF at all? `ftyp`/`styp`/`moov` found within the
    * first few TOP-LEVEL boxes — the spec allows moov-first files, and
    * QuickTime-lineage muxers front valid files with `wide`/`free`/
    * `skip` padding or a progressive `mdat`-first layout; a sniff that
    * only accepted ftyp-first would silently drop those whole files
    * from the 100 TB structural listing tier. Leading boxes of those
    * padding/media types are hopped by size (bounded hops); any other
    * leading type means "not ours". */
  def sniff(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 12) return false
    var off = 0
    var hops = 0
    while (hops < 4 && off + 8 <= bytes.length) {
      val t = tag(bytes, off + 4)
      if (t == "ftyp" || t == "styp" || t == "moov") return true
      if (t != "free" && t != "skip" && t != "wide" &&
          t != "mdat" && t != "pdin" && t != "uuid") return false
      val sz0 = u32(bytes, off)
      val adv: Long =
        if (sz0 == 1L) u64(bytes, off + 8)
        else if (sz0 == 0L) return false // box runs to EOF, nothing after
        else sz0
      if (adv < 8L || off + adv > bytes.length) return false
      off += adv.toInt
      hops += 1
    }
    false
  }

  /** One box at `off`: (type, payloadStart, payloadEnd, nextBoxOff), or
    * None when the header is malformed/truncated. */
  private def box(b: Array[Byte], off: Int,
                  limit: Int): Option[(String, Int, Int, Int)] = {
    if (off + 8 > limit) return None
    val sz0 = u32(b, off)
    val t = tag(b, off + 4)
    val (payload, size) =
      if (sz0 == 1L) {
        val big = u64(b, off + 8)
        (off + 16, big)
      } else if (sz0 == 0L) (off + 8, (limit - off).toLong) // to end
      else (off + 8, sz0)
    if (size < (payload - off).toLong || off + size > limit) None
    else Some((t, payload, off + size.toInt, off + size.toInt))
  }

  /** First child box of `typ` inside [from, to). */
  private def child(b: Array[Byte], from: Int, to: Int,
                    typ: String): Option[(Int, Int)] = {
    var off = from
    while (off + 8 <= to) {
      box(b, off, to) match {
        case Some((t, p, e, n)) =>
          if (t == typ) return Some((p, e))
          off = n
        case None => return None
      }
    }
    None
  }

  /** All child boxes of `typ` inside [from, to). */
  private def children(b: Array[Byte], from: Int, to: Int,
                       typ: String): Seq[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var off = from
    var ok = true
    while (ok && off + 8 <= to) {
      box(b, off, to) match {
        case Some((t, p, e, n)) =>
          if (t == typ) out += ((p, e))
          off = n
        case None => ok = false
      }
    }
    out.result()
  }

  /** The video track's sample tables, fully resolved. */
  private final case class Track(codec: String, width: Int, height: Int,
                                 timescale: Long, duration: Long,
                                 samples: Vector[(Long, Long)] /* off,len */)

  private def parseVideoTrack(b: Array[Byte]): Option[Track] = {
    val (moovP, moovE) = child(b, 0, b.length, "moov").getOrElse(return None)
    for ((trakP, trakE) <- children(b, moovP, moovE, "trak")) {
      val r = for {
        (mdiaP, mdiaE) <- child(b, trakP, trakE, "mdia")
        (hdlrP, _) <- child(b, mdiaP, mdiaE, "hdlr")
        if tag(b, hdlrP + 8) == "vide"
        (tkhdP, _) <- child(b, trakP, trakE, "tkhd")
        (mdhdP, _) <- child(b, mdiaP, mdiaE, "mdhd")
        (minfP, minfE) <- child(b, mdiaP, mdiaE, "minf")
        (stblP, stblE) <- child(b, minfP, minfE, "stbl")
        (stsdP, stsdE) <- child(b, stblP, stblE, "stsd")
        (stszP, stszE) <- child(b, stblP, stblE, "stsz")
        (stscP, stscE) <- child(b, stblP, stblE, "stsc")
      } yield {
        // mdhd: v0 timescale@12 duration@16 (u32); v1 @20 (u32) / @24 (u64)
        val v = b(mdhdP) & 0xff
        val (tsc, dur) =
          if (v == 1) (u32(b, mdhdP + 20), u64(b, mdhdP + 24))
          else (u32(b, mdhdP + 12), u32(b, mdhdP + 16))
        // stsd: count@4, first entry at +8: size, format, then the
        // VisualSampleEntry fields — width/height at entry+32/+34
        if (u32(b, stsdP + 4) < 1) return None
        val entry = stsdP + 8
        if (entry + 36 > stsdE) return None
        val codec = tag(b, entry + 4)
        val w = u16(b, entry + 32)
        val h = u16(b, entry + 34)
        // stsz: sample_size@4 (0 = table), count@8, sizes. Every count
        // is validated against the BOX'S OWN byte length BEFORE any
        // allocation — a corrupt count must fail to None, not
        // materialize a multi-GB table (OOM is a VirtualMachineError
        // the never-throw handlers cannot catch).
        val fixedSz = u32(b, stszP + 4)
        val n0 = u32(b, stszP + 8)
        if (n0 < 0 || n0 > Int.MaxValue) return None
        if (fixedSz == 0 && 12L + 4L * n0 > (stszE - stszP).toLong)
          return None
        // fixed-size path: the count is not backed by a table in the
        // box, so bound it by the blob itself — n samples of fixedSz
        // bytes must fit in the file, or the count is corrupt.
        if (fixedSz != 0 && fixedSz * n0 > (b.length - 16).toLong)
          return None
        val n = n0.toInt
        val sizes = Array.tabulate(n) { i =>
          if (fixedSz != 0) fixedSz else u32(b, stszP + 12 + 4 * i)
        }
        if (sizes.exists(_ < 0)) return None
        // chunk offsets: stco (u32) or co64 (u64)
        val offsets: Array[Long] =
          child(b, stblP, stblE, "stco") match {
            case Some((p, e)) =>
              val c = u32(b, p + 4)
              if (c < 0 || 8L + 4L * c > (e - p).toLong) return None
              Array.tabulate(c.toInt)(i => u32(b, p + 8 + 4 * i))
            case None => child(b, stblP, stblE, "co64") match {
              case Some((p, e)) =>
                val c = u32(b, p + 4)
                if (c < 0 || 8L + 8L * c > (e - p).toLong) return None
                Array.tabulate(c.toInt)(i => u64(b, p + 8 + 8 * i))
              case None => return None
            }
          }
        if (offsets.exists(_ < 0)) return None
        // stsc runs: (first_chunk 1-based, samples_per_chunk)
        val nRuns = u32(b, stscP + 4)
        if (nRuns < 0 || 8L + 12L * nRuns > (stscE - stscP).toLong)
          return None
        val runs = Array.tabulate(nRuns.toInt) { i =>
          val base = stscP + 8 + 12 * i
          (u32(b, base), u32(b, base + 4))
        }
        if (runs.exists(r => r._1 < 1 || r._2 < 1)) return None
        // expand: walk chunks, assign consecutive samples
        val samples = Vector.newBuilder[(Long, Long)]
        var sample = 0
        var run = 0
        var chunkIdx = 0
        while (sample < n && chunkIdx < offsets.length) {
          while (run + 1 < runs.length &&
            runs(run + 1)._1 <= chunkIdx + 1) run += 1
          val spc = runs(run)._2.toInt
          var within = 0
          var off = offsets(chunkIdx)
          while (within < spc && sample < n) {
            val len = sizes(sample)
            if (off < 0 || len < 0 || off + len > b.length) return None
            samples += ((off, len))
            off += len
            within += 1
            sample += 1
          }
          chunkIdx += 1
        }
        val moovSamples0 = samples.result()
        if (moovSamples0.length != n) return None
        // movie fragments (fMP4/CMAF — what streaming captures emit):
        // the moov tables above cover only the progressive samples
        // (often ZERO in a fragmented file); the rest live in moof/trun
        // tables. Resolving them here keeps decode/meta honest — a
        // fragmented file must never read as "this container holds n
        // frames" when the fragments hold more (the silent-partial
        // class of error).
        val tkv = b(tkhdP) & 0xff // tkhd v1 has 8-byte create/modify
        val trackId = u32(b, tkhdP + (if (tkv == 1) 20 else 12))
        val hasMvex = child(b, moovP, moovE, "mvex").isDefined
        val (frags, moofsUnmatched) =
          parseFragments(b, trackId, hasMvex).getOrElse(return None)
        // moofs exist, none carried this track, and the moov tables are
        // empty too: a corrupt tkhd track_ID reading as garbage would
        // otherwise turn a streaming capture into a zero-frame SUCCESS
        if (moovSamples0.isEmpty && frags.isEmpty && moofsUnmatched)
          return None
        Track(codec, w, h, tsc, dur, moovSamples0 ++ frags)
      }
      r match {
        case Some(t) => return Some(t)
        case None => () // not the video trak (or malformed) — next trak
      }
    }
    None
  }

  /** Sample ranges carried by movie fragments (`moof`→`traf`→`tfhd`/
    * `trun`, ISO 14496-12 §8.8). Returns `(samples, moofsUnmatched)`:
    * empty samples when the file has no fragments (the plain
    * progressive case), `None` when fragments exist but use a layout
    * this walk cannot resolve (missing trun data offset, no per-sample
    * or default size, a non-first traf relying on the
    * end-of-previous-traf base default, corrupt tables) — the caller
    * then fails the WHOLE parse rather than returning the moov samples
    * as a silent partial. `moofsUnmatched` = moofs exist but none
    * carried this track (legal when the track is fully progressive;
    * the silent-empty hazard when the moov tables are ALSO empty — the
    * caller decides). `expectFrags` (the moov declared `mvex`) makes
    * the top-level walk strict even before the first moof. Supported
    * bases: explicit base-data-offset (0x1), default-base-is-moof
    * (0x20000), and the first-traf-defaults-to-moof-start rule. */
  private def parseFragments(
      b: Array[Byte], trackId: Long,
      expectFrags: Boolean): Option[(Vector[(Long, Long)], Boolean)] = {
    val out = Vector.newBuilder[(Long, Long)]
    // Top-level walk, STRICT once fragments are in play (unlike the
    // tolerant children()): a malformed top-level box must fail the
    // parse when the file declares fragments (mvex) or has already
    // shown a moof — a fragmented file truncated mid-moof would
    // otherwise decode its surviving prefix as a shorter full success.
    // A plain progressive file (no mvex, no moof yet) keeps its old
    // tolerance for trailing non-box data (vendor trailers like
    // Samsung SEF / GoPro appendices), which never held frames.
    // (moofBoxStart, payloadStart, payloadEnd) — the box's TRUE start
    // is recorded, not reconstructed as payload-8, so a 64-bit
    // largesize moof header keeps default-base-is-moof offsets right.
    val moofs = Vector.newBuilder[(Long, Int, Int)]
    var sawMoof = false
    var top = 0
    var walking = true
    while (walking && top + 8 <= b.length) {
      box(b, top, b.length) match {
        case Some((t, p, e, n)) =>
          if (t == "moof") { moofs += ((top.toLong, p, e)); sawMoof = true }
          top = n
        case None =>
          if (expectFrags || sawMoof) return None
          walking = false // trailing junk on a progressive file
      }
    }
    var matchedTraf = false
    for ((moofStart, moofP, moofE) <- moofs.result()) {
      var trafIdx = 0
      for ((trafP, trafE) <- children(b, moofP, moofE, "traf")) {
        val (tfhdP, _) = child(b, trafP, trafE, "tfhd").getOrElse(return None)
        val tfFlags = u32(b, tfhdP) & 0xffffffL
        if (u32(b, tfhdP + 4) == trackId) {
          matchedTraf = true
          // optional tfhd fields, in spec order
          var p = tfhdP + 8
          val baseOff: Long =
            if ((tfFlags & 0x1L) != 0) { val v = u64(b, p); p += 8; v }
            else if ((tfFlags & 0x20000L) != 0) moofStart
            else if (trafIdx == 0) moofStart // spec first-traf default
            else return None // end-of-previous-traf chaining: unsupported
          if ((tfFlags & 0x2L) != 0) p += 4 // sample_description_index
          if ((tfFlags & 0x8L) != 0) p += 4 // default_sample_duration
          val defSize: Long =
            if ((tfFlags & 0x10L) != 0) { val v = u32(b, p); p += 4; v }
            else -1L
          for ((trunP, trunE) <- children(b, trafP, trafE, "trun")) {
            val trFlags = u32(b, trunP) & 0xffffffL
            val count = u32(b, trunP + 4)
            if (count < 0 || count > Int.MaxValue) return None
            var q = trunP + 8
            if ((trFlags & 0x1L) == 0) return None // need explicit offset
            val dataOff = u32(b, q).toInt; q += 4 // signed 32
            if ((trFlags & 0x4L) != 0) q += 4 // first_sample_flags
            val hasDur = (trFlags & 0x100L) != 0
            val hasSize = (trFlags & 0x200L) != 0
            val hasFl = (trFlags & 0x400L) != 0
            val hasCts = (trFlags & 0x800L) != 0
            if (!hasSize && defSize < 0) return None
            // bound count BEFORE appending anything: a corrupt count
            // must fail to None, never allocate 2^31 tuples (OOM is a
            // VirtualMachineError the never-throw handlers can't catch)
            val perSample = (if (hasDur) 4 else 0) + (if (hasSize) 4 else 0) +
              (if (hasFl) 4 else 0) + (if (hasCts) 4 else 0)
            if (perSample > 0) {
              if (q + perSample.toLong * count > trunE) return None
            } else {
              // fixed-size samples: the run must fit in the file
              if (defSize <= 0 ||
                baseOff + dataOff + defSize * count > b.length) return None
            }
            var off = baseOff + dataOff
            var i = 0
            while (i < count) {
              if (hasDur) q += 4
              val len =
                if (hasSize) { val v = u32(b, q); q += 4; v } else defSize
              if (hasFl) q += 4
              if (hasCts) q += 4
              if (q > trunE || off < 0 || len < 0 ||
                off + len > b.length) return None
              out += ((off, len))
              off += len
              i += 1
            }
          }
        }
        trafIdx += 1
      }
    }
    // moofs present but NONE carried the video track while the moov
    // tables are also empty = the silent-empty hazard (a corrupt tkhd
    // track_ID reading as garbage) — the CALLER decides with its moov
    // sample count; we report what we saw.
    Some((out.result(), sawMoof && !matchedTraf))
  }

  /** Structural metadata for ANY codec — never decodes a sample. */
  def meta(bytes: Array[Byte]): Option[Meta] =
    if (!sniff(bytes)) None
    else try parseVideoTrack(bytes).map(t =>
      Meta(t.codec, t.width, t.height, t.samples.length.toLong,
        t.timescale, t.duration))
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodable(codec: String): Boolean =
    codec == "jpeg" || codec == "mjpa"

  /** Full decode — JPEG-coded tracks only (`None` for codecs the JVM
    * cannot run, so the [[VideoDecoder]] chain defers honestly). */
  def decode(bytes: Array[Byte]): Option[Seq[VisionOps.Gray]] =
    if (!sniff(bytes)) None
    else try {
      parseVideoTrack(bytes).filter(t => decodable(t.codec)).flatMap { t =>
        t.samples.foldLeft(Option(Vector.empty[VisionOps.Gray])) {
          case (accOpt, (off, len)) => accOpt.flatMap { acc =>
            val body = new Array[Byte](len.toInt)
            System.arraycopy(bytes, off.toInt, body, 0, len.toInt)
            MultimodalOps.decodeImage(body).map(g => acc :+ VisionOps.grayOf(g))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Strided decode: the sample TABLE is fully validated (it is the
    * container contract — parseVideoTrack bounds-checks every sample
    * range), the codec runs only on sampled frames. MJPEG samples are
    * all keyframes, so any stride is seekable. */
  def decodeStrided(bytes: Array[Byte],
                    stride: Int): Option[Iterator[(Int, VisionOps.Gray)]] =
    if (!sniff(bytes)) None
    else try {
      parseVideoTrack(bytes).filter(t => decodable(t.codec)).flatMap { t =>
        t.samples.zipWithIndex
          .collect { case (s, f) if f % stride == 0 => (s, f) }
          .foldLeft(Option(Vector.empty[(Int, VisionOps.Gray)])) {
            case (accOpt, ((off, len), f)) => accOpt.flatMap { acc =>
              val body = new Array[Byte](len.toInt)
              System.arraycopy(bytes, off.toInt, body, 0, len.toInt)
              MultimodalOps.decodeImage(body)
                .map(g => acc :+ ((f, VisionOps.grayOf(g))))
            }
          }.map(_.iterator)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------- encoder
  // (fixture/spec muxer — a minimal, spec-valid single-video-track mp4)

  private def bbox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length).put(typ.getBytes(Ascii)).put(payload)
    out.array()
  }

  private def full(typ: String, payload: Array[Byte],
                   version: Int = 0): Array[Byte] =
    bbox(typ, ByteBuffer.allocate(4 + payload.length)
      .putInt(version << 24).put(payload).array())

  private def fullF(typ: String, flags: Int,
                    payload: Array[Byte]): Array[Byte] =
    bbox(typ, ByteBuffer.allocate(4 + payload.length)
      .putInt(flags & 0xffffff).put(payload).array())

  /** Mux JPEG (or any single-codec) samples into a minimal mp4: ftyp,
    * mdat (samples back-to-back), moov with one `vide` track whose
    * stsd carries `codecTag` and whose stco points into the mdat.
    * `codecTag` defaults to "jpeg" (decodable); pass "avc1" to build a
    * metadata-only fixture (payloads opaque). `largeFile = true` emits
    * the >4 GB shapes — a 64-bit `largesize` mdat header and `co64`
    * chunk offsets (what the reference's 4 GB session videos require) —
    * so the 64-bit parse paths are PINNABLE on small fixtures. */
  def encode(w: Int, h: Int, samples: Seq[Array[Byte]],
             fps: Int = 30, codecTag: String = "jpeg",
             largeFile: Boolean = false): Array[Byte] = {
    require(codecTag.length == 4, "codec tag must be a fourcc")
    val ftyp = ftypBox
    val mdatPayload = samples.flatten.toArray
    val mdat =
      if (largeFile) ByteBuffer.allocate(16 + mdatPayload.length)
        .putInt(1).put("mdat".getBytes(Ascii))
        .putLong(16L + mdatPayload.length).put(mdatPayload).array()
      else bbox("mdat", mdatPayload)
    val mdatHdr = if (largeFile) 16 else 8
    val firstSample = ftyp.length + mdatHdr // into mdat payload
    val n = samples.length
    val timescale = 600
    val delta = if (fps > 0) timescale / fps else 20
    val duration = n.toLong * delta

    // VisualSampleEntry: 6 reserved + dref idx + 16 predefined/reserved
    // + w + h + 72 dpi×2 + reserved + frame_count + compressorname(32)
    // + depth + pre_defined
    val stts = full("stts", ByteBuffer.allocate(12)
      .putInt(1).putInt(n).putInt(delta).array())
    val stsc = full("stsc", ByteBuffer.allocate(16)
      .putInt(1).putInt(1).putInt(math.max(n, 1)).putInt(1).array())
    val stszB = ByteBuffer.allocate(8 + 4 * n).putInt(0).putInt(n)
    samples.foreach(s => stszB.putInt(s.length))
    val stsz = full("stsz", stszB.array())
    val chunkOffs =
      if (largeFile) full("co64", ByteBuffer.allocate(12)
        .putInt(1).putLong(firstSample.toLong).array())
      else full("stco", ByteBuffer.allocate(8)
        .putInt(1).putInt(firstSample).array())
    val moov = moovBox(w, h, codecTag, timescale, duration.toInt,
      stts ++ stsc ++ stsz ++ chunkOffs, Array.emptyByteArray)
    ftyp ++ mdat ++ moov
  }

  /** Mux with an EXPLICIT chunk layout — multiple `stco` entries and
    * run-length-encoded `stsc` runs, the shape real progressive muxers
    * emit when interleaving tracks. Pins the stsc run-expansion walk
    * beyond the single-chunk layout [[encode]] produces. */
  def encodeChunked(w: Int, h: Int, chunks: Seq[Seq[Array[Byte]]],
                    fps: Int = 30,
                    codecTag: String = "jpeg"): Array[Byte] = {
    require(codecTag.length == 4, "codec tag must be a fourcc")
    require(chunks.nonEmpty && chunks.forall(_.nonEmpty),
      "every chunk must hold at least one sample")
    val ftyp = ftypBox
    val samples = chunks.flatten
    val mdat = bbox("mdat", samples.flatten.toArray)
    val n = samples.length
    val timescale = 600
    val delta = if (fps > 0) timescale / fps else 20
    val stts = full("stts", ByteBuffer.allocate(12)
      .putInt(1).putInt(n).putInt(delta).array())
    // stsc: RLE over samples-per-chunk (first_chunk is 1-based)
    val runs = chunks.map(_.length).zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc
        else acc :+ ((i + 1, spc))
      }
    val stscB = ByteBuffer.allocate(4 + 12 * runs.length).putInt(runs.length)
    runs.foreach { case (first, spc) =>
      stscB.putInt(first).putInt(spc).putInt(1) }
    val stsc = full("stsc", stscB.array())
    val stszB = ByteBuffer.allocate(8 + 4 * n).putInt(0).putInt(n)
    samples.foreach(s => stszB.putInt(s.length))
    val stsz = full("stsz", stszB.array())
    val offs = chunks.scanLeft(ftyp.length + 8) { (off, c) =>
      off + c.map(_.length).sum }.init
    val stcoB = ByteBuffer.allocate(4 + 4 * offs.length).putInt(offs.length)
    offs.foreach(stcoB.putInt)
    val stco = full("stco", stcoB.array())
    val moov = moovBox(w, h, codecTag, timescale, (n.toLong * delta).toInt,
      stts ++ stsc ++ stsz ++ stco, Array.emptyByteArray)
    ftyp ++ mdat ++ moov
  }

  private def ftypBox: Array[Byte] =
    bbox("ftyp", ByteBuffer.allocate(16)
      .put("isom".getBytes(Ascii)).putInt(0x200)
      .put("isom".getBytes(Ascii)).put("mp41".getBytes(Ascii)).array())

  /** The shared moov: one `vide` track (track_ID 1) whose stsd carries
    * `codecTag`; `tables` supplies stts/stsc/stsz/stco (empty tables
    * for the fragmented form) and `mvex` is appended when fragments
    * follow. */
  private def moovBox(w: Int, h: Int, codecTag: String, timescale: Int,
                      duration: Int, tables: Array[Byte],
                      mvex: Array[Byte]): Array[Byte] = {
    val entry = ByteBuffer.allocate(8 + 78)
    entry.putInt(8 + 78).put(codecTag.getBytes(Ascii))
      .put(new Array[Byte](6)).putShort(1)
      .putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
      .putShort(w.toShort).putShort(h.toShort)
      .putInt(0x480000).putInt(0x480000).putInt(0).putShort(1)
      .put(new Array[Byte](32)).putShort(24).putShort(-1)
    val stsd = full("stsd", ByteBuffer.allocate(4 + entry.capacity())
      .putInt(1).put(entry.array()).array())
    val stbl = bbox("stbl", stsd ++ tables)
    val vmhd = full("vmhd", new Array[Byte](8), version = 0)
    val dref = full("dref", ByteBuffer.allocate(4 + 12).putInt(1)
      .putInt(12).put("url ".getBytes(Ascii)).putInt(1).array())
    val dinf = bbox("dinf", dref)
    val minf = bbox("minf", vmhd ++ dinf ++ stbl)
    val hdlr = full("hdlr", ByteBuffer.allocate(21)
      .putInt(0).put("vide".getBytes(Ascii))
      .putInt(0).putInt(0).putInt(0).put(0.toByte).array())
    val mdhd = full("mdhd", ByteBuffer.allocate(16)
      .putInt(0).putInt(0).putInt(timescale).putInt(duration).array())
    val mdia = bbox("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = full("tkhd", ByteBuffer.allocate(80)
      .putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
      .putInt(0).putInt(0).putShort(0).putShort(0).putShort(0).putShort(0)
      .putInt(0x10000).putInt(0).putInt(0)
      .putInt(0).putInt(0x10000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(w << 16).putInt(h << 16).array(), version = 0)
    val trak = bbox("trak", tkhd ++ mdia)
    val mvhd = full("mvhd", ByteBuffer.allocate(96)
      .putInt(0).putInt(0).putInt(timescale).putInt(duration)
      .putInt(0x10000).putShort(0x100).putShort(0)
      .putInt(0).putInt(0)
      .putInt(0x10000).putInt(0).putInt(0)
      .putInt(0).putInt(0x10000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      .putInt(2).array())
    bbox("moov", mvhd ++ trak ++ mvex)
  }

  /** Mux samples as a FRAGMENTED mp4 (the fMP4/CMAF shape streaming
    * captures emit): ftyp, a moov whose sample tables are EMPTY (the
    * `mvex`/`trex` declares fragment defaults), then one `moof`+`mdat`
    * pair per `perFrag` samples — tfhd sets default-base-is-moof, each
    * trun carries an explicit data offset and per-sample sizes. The
    * spec/fixture muxer for [[parseFragments]]. */
  def encodeFragmented(w: Int, h: Int, samples: Seq[Array[Byte]],
                       perFrag: Int = 2, fps: Int = 30,
                       codecTag: String = "jpeg"): Array[Byte] = {
    require(codecTag.length == 4, "codec tag must be a fourcc")
    require(perFrag >= 1, "perFrag must be >= 1")
    val timescale = 600
    val delta = if (fps > 0) timescale / fps else 20
    val duration = samples.length.toLong * delta
    val emptyTables =
      full("stts", ByteBuffer.allocate(4).putInt(0).array()) ++
      full("stsc", ByteBuffer.allocate(4).putInt(0).array()) ++
      full("stsz", ByteBuffer.allocate(8).putInt(0).putInt(0).array()) ++
      full("stco", ByteBuffer.allocate(4).putInt(0).array())
    val trex = fullF("trex", 0, ByteBuffer.allocate(20)
      .putInt(1).putInt(1).putInt(delta).putInt(0).putInt(0).array())
    val moov = moovBox(w, h, codecTag, timescale, duration.toInt,
      emptyTables, bbox("mvex", trex))
    val frags = samples.grouped(perFrag).zipWithIndex.map {
      case (grp, seq) =>
        val mfhd = full("mfhd", ByteBuffer.allocate(4)
          .putInt(seq + 1).array())
        val tfhd = fullF("tfhd", 0x020000, // default-base-is-moof
          ByteBuffer.allocate(4).putInt(1).array())
        // moof = 8 + mfhd(16) + traf(8 + tfhd(16) + trun(20 + 4n));
        // first sample starts right after the following mdat header
        val trunSz = 20 + 4 * grp.length
        val moofSz = 8 + 16 + 8 + 16 + trunSz
        val trunB = ByteBuffer.allocate(8 + 4 * grp.length)
          .putInt(grp.length).putInt(moofSz + 8)
        grp.foreach(s => trunB.putInt(s.length))
        val trun = fullF("trun", 0x000201, trunB.array()) // offset+sizes
        val moof = bbox("moof", mfhd ++ bbox("traf", tfhd ++ trun))
        assert(moof.length == moofSz, s"moof size drift: ${moof.length}")
        moof ++ bbox("mdat", grp.flatten.toArray)
    }
    ftypBox ++ moov ++ frags.flatten.toArray
  }
}
