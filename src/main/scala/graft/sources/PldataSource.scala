package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S4: the reference's .pldata (msgpack) + _timestamps.npy session store
  * (externals/file_methods.py:133-193, odometry.py:43-58) as a Spark
  * source/sink.
  *
  * Read shape: `binaryFile` scan → per-file msgpack decode in
  * mapPartitions → rows. Each file is one session-topic stream (MBs), so
  * the distribution axis is files — exactly the engine's session
  * partitioning. The .npy sidecar rides along by path convention.
  */
object PldataSource {

  /** Minimal .npy v1 reader: little-endian float64 1-D ('<f8'). */
  def readNpyDoubles(path: String): Array[Double] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 10 && bytes(1) == 'N'.toByte, s"not npy: $path")
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    val header = new String(bytes, 10, headerLen, "ASCII")
    require(header.contains("'<f8'"), s"unsupported npy dtype: $header")
    val data = ByteBuffer.wrap(bytes, 10 + headerLen, bytes.length - 10 - headerLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    val n = (bytes.length - 10 - headerLen) / 8
    Array.fill(n)(data.getDouble())
  }

  /** Minimal .npy v1 writer (float64 1-D). */
  def writeNpyDoubles(path: String, values: Array[Double]): Unit =
    writeNpyDoublesStream(path, values.length.toLong, values.iterator)

  /** Streaming .npy v1 writer: `n` values drawn from `it` through a
    * fixed 64 KB buffer — the fixture-write form for driver-side exports
    * fed by `toLocalIterator` (one partition resident at a time) instead
    * of a full `collect`, so driver memory stays FLAT in the table size
    * (the npy shape header needs the count up front; a Spark `count()`
    * is one cheap aggregate next to materializing the rows). */
  def writeNpyDoublesStream(path: String, n: Long,
                            it: Iterator[Double]): Unit = {
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': ($n,), }"
    val pad = 64 - ((10 + dict.length + 1) % 64)
    val header = dict + (" " * pad) + "\n"
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 64 * 1024)
    try {
      val hb = ByteBuffer.allocate(10 + header.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      hb.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
        .put(1.toByte).put(0.toByte)
        .putShort(header.length.toShort).put(header.getBytes("ASCII"))
      out.write(hb.array())
      val vb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      var written = 0L
      while (it.hasNext) {
        vb.clear(); vb.putDouble(it.next())
        out.write(vb.array()); written += 1
      }
      require(written == n, s"npy writer: declared $n values, got $written")
    } finally out.close()
  }

  /** Incremental .npy v1 float64 writer — values appended one at a time,
    * the true count patched into the header on `close()`. The shape field
    * is a fixed 20-char right-padded placeholder so the patch rewrites
    * the header in place at the SAME length (trailing spaces inside a
    * tuple are valid Python literal syntax, so numpy reads it unchanged).
    * Fixture writers fed by `toLocalIterator` use this instead of the
    * count-first [[writeNpyDoublesStream]]: no extra Spark `count()` job
    * just to know the header up front. */
  final class NpyDoubleWriter(path: String) {
    private def dictFor(n: Long): String = {
      val nStr = n.toString.padTo(20, ' ')
      s"{'descr': '<f8', 'fortran_order': False, 'shape': ($nStr,), }"
    }
    private val pad = 64 - ((10 + dictFor(0).length + 1) % 64)
    private def headerBytes(n: Long): Array[Byte] = {
      val header = dictFor(n) + (" " * pad) + "\n"
      val hb = ByteBuffer.allocate(10 + header.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      hb.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
        .put(1.toByte).put(0.toByte)
        .putShort(header.length.toShort).put(header.getBytes("ASCII"))
      hb.array()
    }
    private val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 64 * 1024)
    out.write(headerBytes(0))
    private val vb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    private var n = 0L
    def write(v: Double): Unit = {
      vb.clear(); vb.putDouble(v); out.write(vb.array()); n += 1
    }
    /** Flush, patch the true count into the header, return it. */
    def close(): Long = {
      out.close()
      val raf = new java.io.RandomAccessFile(path, "rw")
      try raf.write(headerBytes(n)) finally raf.close()
      n
    }
  }

  /** Decode one pldata byte stream into (topic, payload-map) pairs. */
  def decodeStream(bytes: Array[Byte]): Vector[(String, Map[String, Any])] =
    MsgPack.unpackStream(bytes).map {
      case Vector(topic: String, payload: Array[Byte]) =>
        topic -> MsgPack.unpackStream(payload).head.asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(s"bad pldata record: $other")
    }

  /** Read `<dir>/<topic>.pldata` (+ `<topic>_timestamps.npy`) into rows of
    * the given projection. Fields are pulled from the payload dicts with
    * the arraydict convention (missing → null); `timestamp` comes from the
    * sidecar (position-aligned, the reference's zip).
    *
    * `fields` maps column name → Spark type (DoubleType,
    * ArrayType(DoubleType), LongType, StringType supported).
    */
  def read(spark: SparkSession, dir: String, topic: String,
           fields: Seq[(String, DataType)]): DataFrame = {
    val schema = StructType(
      StructField("topic", StringType) +:
        StructField("timestamp", DoubleType) +:
        fields.map { case (n, t) => StructField(n, t) })
    // files are session-scoped (MBs): decode distributed, one task per file
    val binDf = spark.read.format("binaryFile")
      .load(s"$dir/$topic.pldata")
      .select("path", "content")
    val ts = readNpyDoubles(s"$dir/${topic}_timestamps.npy")
    val tsB = spark.sparkContext.broadcast(ts)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    binDf.mapPartitions { it =>
      it.flatMap { r =>
        val recs = decodeStream(r.getAs[Array[Byte]]("content"))
        // a short sidecar is corruption — fail loudly (the V2 reader's
        // contract), never fabricate NaN rows that slide past filters
        if (recs.length > tsB.value.length)
          throw new java.io.IOException(
            s"pldata sidecar misalignment in ${r.getAs[String]("path")}: " +
              s"${recs.length} records but only ${tsB.value.length} timestamps")
        recs.iterator.zipWithIndex.map { case ((top, payload), i) =>
          Row.fromSeq(top +: tsB.value(i) +: fields.map { case (name, dt) =>
            convert(payload.get(name).orNull, dt)
          })
        }
      }
    }
  }

  /** Read a topic with a [[graft.schemas.Schemas]] catalog StructType
    * (timestamp supplied by the .npy sidecar). */
  def readAs(spark: SparkSession, dir: String, topic: String,
             schema: StructType): DataFrame =
    read(spark, dir, topic, graft.schemas.Schemas.pldataFields(schema))

  private[sources] def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: Long, DoubleType) => x.toDouble
    case (x: Double, DoubleType) => x
    case (x: Long, LongType) => x
    case (x: Double, LongType) => x.toLong
    case (x: Long, IntegerType) => x.toInt
    case (x: String, StringType) => x
    case (x: Vector[_], ArrayType(DoubleType, _)) =>
      x.map {
        case d: Double => d
        case l: Long => l.toDouble
        case other => Double.NaN
      }
    case (x: Vector[_], ArrayType(inner, _)) => x.map(convert(_, inner))
    // nested detector dicts (e.g. the pupil `ellipse` struct)
    case (x: Map[_, _], st: StructType) =>
      val m = x.asInstanceOf[Map[String, Any]]
      Row.fromSeq(st.fields.toSeq.map(f => convert(m.get(f.name).orNull, f.dataType)))
    case (x, StringType) => String.valueOf(x)
    case (x, _) =>
      throw new IllegalArgumentException(s"cannot convert $x to $dt")
  }

  /** Write rows as a pldata stream + timestamp sidecar (PLData_Writer,
    * file_methods.py:154-193): each row becomes msgpack (topic,
    * packed-payload); timestamps go to the .npy. BOUNDED driver memory:
    * rows stream through `toLocalIterator` (one partition resident at a
    * time) into buffered file writers — no collect, no whole-stream byte
    * buffer — so the fixture write stays flat in the table size. The
    * 100 TB path writes Parquet; this is the session-file export. */
  /** Spark value → msgpack value (nested structs, e.g. the pupil
    * ellipse, become msgpack maps). Shared by the driver-side [[write]]
    * and the distributed V2 sink ([[PldataV2]]) so the two write paths
    * produce byte-identical records. */
  private[sources] def plainValue(v: Any): Any = v match {
    case r: Row => r.schema.fields.zipWithIndex
      .map { case (f, i) => f.name -> plainValue(r.get(i)) }.toMap
    case s: collection.Seq[_] => s.map(plainValue)
    case x => x
  }

  /** The msgpack payload of one row: every non-`topic` field (timestamp
    * included — the PLData_Writer convention). */
  private[sources] def payloadOf(schema: StructType, r: Row): Map[String, Any] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "topic" => f.name -> plainValue(r.get(i))
    }.toMap

  def write(df: DataFrame, dir: String, topic: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tsIdx = df.schema.fieldIndex("timestamp")
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(dir, s"$topic.pldata")), 64 * 1024)
    val tsW = new NpyDoubleWriter(
      Paths.get(dir, s"${topic}_timestamps.npy").toString)
    try {
      import scala.jdk.CollectionConverters._
      df.toLocalIterator().asScala.foreach { r =>
        out.write(MsgPack.pack((topic, MsgPack.pack(payloadOf(df.schema, r)))))
        tsW.write(r.getDouble(tsIdx))
      }
    } finally { out.close(); tsW.close() }
  }

  /** S5: Pupil-Labs `gaze_positions.csv` export scan (read_pl_gaze_csv,
    * utils.py:12-17): resolves the reference's
    * `<session>/exports/<id><id><id>/gaze_positions.csv` layout (the
    * export sub-directory is the output id repeated three times) and
    * reshapes the flat export columns into the catalog gaze row
    * (timestamp, norm_pos array, confidence). Plain `spark.read.csv` —
    * header + schema inference on doubles only. */
  def readGazeCsv(spark: SparkSession, sessionFolder: String,
                  outputId: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = outputId.toString * 3
    val path = Paths.get(sessionFolder, "exports", sub, "gaze_positions.csv")
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path.toString)
      .select(col("gaze_timestamp").cast("double").as("timestamp"),
        array(col("norm_pos_x").cast("double"),
          col("norm_pos_y").cast("double")).as("norm_pos"),
        col("confidence").cast("double"))
  }
}
