package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-column kernels: a REAL zero-dependency WAV (RIFF/PCM) decoder +
  * per-clip feature extraction, completing the multimodal tier's audio
  * arm (images decode via javax.imageio; video stays a documented stub —
  * the JVM ships no video codecs).
  *
  * The decoder hand-parses the RIFF container (chunk walk, unknown
  * chunks skipped, 16-bit little-endian mono/stereo PCM) rather than
  * going through javax.sound — ~40 lines, fully deterministic, and the
  * sample values are exact integers, so every downstream feature (RMS,
  * zero-crossings, peak) is integer-sum arithmetic an external SQL
  * oracle can replay bit-for-bit.
  *
  * Scale shape: one row-local mapPartitions pass over the media table —
  * no shuffle; clips never become long-lived frame tables, only feature
  * rows do (the same S1 batch contract as the vision kernels).
  */
object AudioOps {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Int])

  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) << 8) | (b(o) & 0xff)).toShort.toInt

  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE byte array; None unless it is a well-formed
    * 16-bit PCM file. Interleaved channels are kept as-is (callers see
    * frames·channels samples). */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var data: Option[(Int, Int)] = None
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      // bounds in Long: a crafted sz near Int.MaxValue must fail the
      // check, not wrap negative and pass it
      if (sz < 0 || off.toLong + 8 + sz > bytes.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmt = le16(bytes, off + 8)
          if (fmt != 1) return None // PCM only
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" => data = Some((off + 8, sz))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    data match {
      case Some((o, sz)) if rate > 0 && channels > 0 && bits == 16 =>
        val n = sz / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) { out(i) = le16(bytes, o + 2 * i); i += 1 }
        Some(Wav(rate, channels, out))
      case _ => None
    }
  }

  /** Encode 16-bit PCM mono samples as WAV bytes (fixture writer — the
    * inverse of [[decodeWav]], values clamped to short range). */
  def encodeWavMono(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + 2 * n)
    def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + 2 * n); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2)
    put16(34, 16)
    putTag(36, "data"); put32(40, 2 * n)
    var i = 0
    while (i < n) {
      put16(44 + 2 * i, math.max(-32768, math.min(32767, samples(i))))
      i += 1
    }
    out
  }

  /** Planted audio fixture: a deterministic square wave per id (half
    * period, amplitude and length all integer functions of the id),
    * encoded as REAL WAV bytes — the audio analogue of
    * [[VisionFixtures]]: the decode→feature pipeline recovers planted
    * integer samples exactly, so an external SQL oracle can replay the
    * same generator formula and hash-match the features. */
  def squareWaveParams(id: Long): (Int, Int, Int) =
    ((4 + id % 5).toInt, (8000 + 100 * (id % 7)).toInt,
      (800 + 16 * (id % 11)).toInt)

  val FixtureRate = 8000

  def plantAudioMedia(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = MultimodalOps.mediaSchema
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    import org.apache.spark.sql.functions.col
    // pre-render repartition: same single-file-parallelism rationale as
    // VisionFixtures.plantMedia / TextOps.shingled — and the same
    // EXPLICIT arity, because AQE coalesces a keys-only exchange to one
    // partition and would serialize the WAV render onto one task
    df.select(col(idCol).cast("long"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (hp, amp, n) = squareWaveParams(id)
        val samples = Array.tabulate(n)(i =>
          if ((i / hp) % 2 == 0) amp else -amp)
        Row(id, encodeWavMono(FixtureRate, samples),
          Row("audio/wav", 0, 0, 1))
      }
    }
  }

  /** Speech-shaped planted fixture: the square wave gated by a silence
    * comb — sample i carries the wave iff `(i / gap) % 2 == 0`, else 0.
    * Gives every clip alternating voiced/silent runs so the VAD tier
    * has real segment structure to find; same exact-integer replay
    * contract as [[plantAudioMedia]]. */
  def plantSpeechMedia(df: DataFrame, idCol: String,
                       gap: Int = 200): DataFrame = {
    val outSchema = MultimodalOps.mediaSchema
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    import org.apache.spark.sql.functions.col
    // explicit arity: the plantAudioMedia AQE-coalescing rationale
    df.select(col(idCol).cast("long"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (hp, amp, n) = squareWaveParams(id)
        val samples = Array.tabulate(n)(i =>
          if ((i / gap) % 2 == 0) { if ((i / hp) % 2 == 0) amp else -amp }
          else 0)
        Row(id, encodeWavMono(FixtureRate, samples),
          Row("audio/wav", 0, 0, 1))
      }
    }
  }

  /** Per-WINDOW energies: non-overlapping windows of `win` samples,
    * energy = Σ s² as an exact Long (≤ 2³¹·win — no overflow at any
    * realistic window). One decode pass, rows streamed; the last,
    * partial window keeps its true (smaller) sample count's energy. */
  def windowEnergies(media: DataFrame, win: Int = 160): DataFrame = {
    require(win >= 1, s"window must be >= 1, got $win")
    val idIdx = media.schema.fieldIndex("media_id")
    val bIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("win_idx", IntegerType),
      StructField("energy", LongType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]](bIdx)).iterator.flatMap { w =>
          val n = w.samples.length
          (0 until (n + win - 1) / win).iterator.map { wi =>
            var e = 0L
            var i = wi * win
            val end = math.min(i + win, n)
            while (i < end) {
              val s = w.samples(i); e += s.toLong * s; i += 1
            }
            Row(r.getLong(idIdx), wi, e)
          }
        }
      }
    }
  }

  /** Energy-threshold VAD segmentation: windows at/above `threshold`
    * are voiced; consecutive voiced windows merge into segments
    * (media_id, seg_id, start_win, end_win, n_win, energy) — the audio
    * analogue of the W1 RLE tier, and the clip-trimming stage a speech
    * training pipeline runs before transcription/packing. The kernel
    * emits only (window, energy) rows; the run-length merge is the
    * declarative lag/cumsum shape, so Catalyst owns the shuffle and the
    * whole chain replays exactly in SQL (integer energies, integer
    * compares — no float thresholds). */
  def vadSegments(media: DataFrame, win: Int = 160,
                  threshold: Long = 5000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = windowEnergies(media, win)
      .withColumn("_act", col("energy") >= threshold)
    val w = Window.partitionBy("media_id").orderBy("win_idx")
    val prev = lag(col("_act"), 1).over(w)
    val seg = e
      .withColumn("_brk",
        when(prev.isNull || prev =!= col("_act"), 1).otherwise(0))
      .withColumn("_sid", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_act"))
      .groupBy(col("media_id"), col("_sid"))
      .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
        count(lit(1)).as("n_win"), sum("energy").as("energy"))
    seg.withColumn("seg_id", row_number().over(
        Window.partitionBy("media_id").orderBy("start_win")))
      .select(col("media_id"), col("seg_id"), col("start_win"),
        col("end_win"), col("n_win"), col("energy"))
  }

  /** ROW-LOCAL twin of [[vadSegments]]: a clip is self-contained, so
    * the threshold + run-length merge can run INSIDE the decode kernel
    * and emit segment rows directly — no exchange at all, and therefore
    * stream-legal in append mode with zero state stores (non-time
    * window functions are not available on streams; this is the
    * at-ingest shape). Bit-identical to the declarative form
    * (spec-pinned): same windows, same integer compares, same
    * renumbering by start window. Prefer the declarative form when the
    * windows are already a table; prefer this one at ingest. */
  def vadSegmentsInline(media: DataFrame, win: Int = 160,
                        threshold: Long = 5000000000L): DataFrame = {
    require(win >= 1, s"window must be >= 1, got $win")
    val idIdx = media.schema.fieldIndex("media_id")
    val bIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("seg_id", IntegerType),
      StructField("start_win", IntegerType),
      StructField("end_win", IntegerType),
      StructField("n_win", LongType),
      StructField("energy", LongType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]](bIdx)).iterator.flatMap { w =>
          val id = r.getLong(idIdx)
          val n = w.samples.length
          val nWin = (n + win - 1) / win
          val segs = Vector.newBuilder[Row]
          var segId = 0
          var start = -1; var count = 0L; var acc = 0L
          var wi = 0
          while (wi < nWin) {
            var e = 0L
            var i = wi * win
            val end = math.min(i + win, n)
            while (i < end) { val s = w.samples(i); e += s.toLong * s; i += 1 }
            if (e >= threshold) {
              if (start < 0) { start = wi; count = 0L; acc = 0L }
              count += 1; acc += e
            } else if (start >= 0) {
              segId += 1
              segs += Row(id, segId, start, wi - 1, count, acc)
              start = -1
            }
            wi += 1
          }
          if (start >= 0) {
            segId += 1
            segs += Row(id, segId, start, nWin - 1, count, acc)
          }
          segs.result()
        }
      }
    }
  }

  /** Per-clip features from exact integer samples:
    *  - `duration_sec` = frames / rate
    *  - `rms` = sqrt(Σ s² / n) (sums exact in doubles up to 2⁵³)
    *  - `peak` = max |s|
    *  - `zero_crossings` = #{i : s(i−1)·s(i) < 0}
    * Rows whose bytes are not decodable WAV yield no output (the same
    * sentinel-free contract as the vision detectors). */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val bIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_sec", DoubleType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType),
      StructField("zero_crossings", LongType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]](bIdx)).iterator.map { w =>
          val n = w.samples.length
          val ch = w.channels
          var ss = 0L; var peak = 0; var zc = 0L
          var i = 0
          while (i < n) {
            val s = w.samples(i)
            ss += s.toLong * s
            // samples sit in Int storage, so abs(-32768) = 32768 exactly
            val a = math.abs(s)
            if (a > peak) peak = a
            // crossings stride by channel: adjacent INTERLEAVED samples
            // of a stereo clip belong to different channels
            if (i >= ch && w.samples(i - ch).toLong * s < 0) zc += 1
            i += 1
          }
          val frames = n / w.channels
          Row(r.getLong(idIdx), w.sampleRate, n.toLong,
            frames.toDouble / w.sampleRate,
            math.sqrt(if (n == 0) 0.0 else ss.toDouble / n), peak, zc)
        }
      }
    }
  }

  /** In-place iterative radix-2 FFT (Cooley-Tukey, decimation in time,
    * negative-exponent convention). Zero-dependency — the JVM ships no
    * FFT — and allocation-free past the caller's two arrays, so the
    * per-clip spectral pass stays a narrow mapPartitions kernel at any
    * corpus size. Length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"fft length must be a power of 2, got $n")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < half) {
          val ur = re(s + k); val ui = im(s + k)
          val xr = re(s + k + half); val xi = im(s + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + half) = ur - vr; im(s + k + half) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Per-clip SPECTRAL features over the first `window` frames of
    * channel 0 (clips shorter than the window yield no row — the
    * detector contract): one [[fft]] per clip inside the same
    * mapPartitions shape as [[extractAudioFeatures]].
    *
    *  - `dc`, `nyquist`: Σs and Σ(−1)ⁱs — computed as EXACT integer
    *    sums (not read off the fp spectrum), so an external oracle can
    *    state them; the spec pins X[0]/X[w/2] against them.
    *  - `dominant_bin`: argmax |X[k]| over k ∈ [1, window/2), first
    *    maximum — the fundamental detector.
    *  - `dominant_freq_hz` = bin · rate/window.
    *  - `parseval_ok`: |Σ|X|²/(w·Σx²) − 1| < 1e-9 — Parseval's theorem,
    *    an engine-measured law over the WHOLE spectrum: any butterfly,
    *    twiddle, or indexing bug in the kernel breaks it.
    *
    * SILENT-CLIP contract (r12 verdict "what's wrong" #1): an all-zero
    * window has no spectrum to rank, so `dominant_bin`/`dominant_freq_hz`
    * are NULL and `parseval_ok` asserts the two-sided-zero form of the
    * law — the measured spectral energy must be EXACTLY 0.0 (a kernel
    * bug that conjures energy from silence still fails it). The ratio
    * form would be 0/0; reporting that NaN as a law violation mislabeled
    * a correct FFT. */
  def spectralFeatures(media: DataFrame, window: Int = 512): DataFrame = {
    require(window > 0 && (window & (window - 1)) == 0,
      s"window must be a power of 2, got $window")
    val idIdx = media.schema.fieldIndex("media_id")
    val bIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dc", LongType),
      StructField("nyquist", LongType),
      StructField("dominant_bin", IntegerType),
      StructField("dominant_freq_hz", DoubleType),
      StructField("parseval_ok", BooleanType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]](bIdx)).iterator
          .filter(w => w.samples.length / w.channels >= window)
          .map { w =>
            val ch = w.channels
            val re = new Array[Double](window)
            val im = new Array[Double](window)
            var dc = 0L; var nyq = 0L; var e2 = 0L
            var i = 0
            while (i < window) {
              val s = w.samples(i * ch) // channel 0
              re(i) = s.toDouble
              dc += s
              nyq += (if ((i & 1) == 0) s.toLong else -s.toLong)
              e2 += s.toLong * s
              i += 1
            }
            fft(re, im)
            var best = 1; var bestMag = -1.0
            var specE = 0.0
            var k = 0
            while (k < window) {
              val m2 = re(k) * re(k) + im(k) * im(k)
              specE += m2
              if (k >= 1 && k < window / 2 && m2 > bestMag) {
                bestMag = m2; best = k
              }
              k += 1
            }
            if (e2 == 0L) // silent clip: no spectrum to rank (see contract)
              Row(r.getLong(idIdx), dc, nyq, null, null, specE == 0.0)
            else {
              val ratio = specE / (window.toDouble * e2.toDouble)
              Row(r.getLong(idIdx), dc, nyq, best,
                best * (w.sampleRate.toDouble / window),
                math.abs(ratio - 1.0) < 1e-9)
            }
          }
      }
    }
  }
}
