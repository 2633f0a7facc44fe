package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the STREAMING count-min tier —
  * the `stream_cm_counters` drain run at 500,000 docs across MANY
  * micro-batches (maxFilesPerTrigger bounds each trigger, so the
  * stateful aggregate genuinely accumulates across ~16 batches instead
  * of absorbing the corpus in one), against a driver-computed expected
  * counter grid.
  *
  * Corpus: the Cdc100x shape — 1,000 distinct texts with text-scoped
  * vocabularies × 500 replicas. Expected counters are closed-form:
  * every bigram's corpus count = 500 × its per-text occurrence count,
  * and the bucket arithmetic (salted md5-hash60 mod width) replays on
  * the driver over just the 1,000 distinct texts (~40k grams) — the
  * engine hashes 19.5M gram occurrences × 3 rows.
  *
  * Laws asserted: the drained grid EQUALS the expected grid exactly
  * (same occupied cells, same counts — a lost partial, double-counted
  * restart, or wrong state key breaks it), the grid stays ≤ depth×width
  * rows (bounded state at 100×, the reason sketch-shaped stream state
  * exists), and total mass = depth × total gram occurrences.
  *
  * Usage: runMain graft.tools.SketchStream100x [nDocs]
  */
object SketchStream100x {
  private val N = 2; private val Depth = 3; private val Width = 2048

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val reps = 500L
    val nDistinct = ((n + reps - 1) / reps).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        transform(sequence(lit(0),
            (lit(19) + pmod(col("id") % nDistinct, lit(41L))).cast("int")), w =>
          concat(lit("x"), (col("id") % nDistinct).cast("string"), lit("_"),
            w.cast("string")))).as("text"))
    val src = java.nio.file.Files
      .createTempDirectory("graft_cm100x_src").toString
    docs.repartition(32).write.mode("overwrite").parquet(src)

    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "2") // force real multi-batch state
      .parquet(src)
    val qn = "cm100x_drain"
    val q = graft.streaming.SketchStream
      .countersShared(stream, "text", N, Depth, Width)
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(qn).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val engineSec = (System.nanoTime() - t0) / 1e9
    val batches = q.recentProgress.count(_.numInputRows > 0)

    // ---- driver replay over the 1,000 distinct texts ----
    val expected = scala.collection.mutable.Map[(Int, Long), Long]()
    var gramsPerCorpus = 0L
    for (t <- 0 until nDistinct) {
      val toks = (0 until (20 + t % 41)).map(w => s"x${t}_$w")
      val grams = toks.sliding(N).map(_.mkString(" ")).toSeq
      gramsPerCorpus += grams.size * reps
      for (g <- grams; i <- 0 until Depth) {
        val b = java.lang.Math.floorMod(hash60(s"cm$i:$g"), Width.toLong)
        expected((i, b)) = expected.getOrElse((i, b), 0L) + reps
      }
    }
    val missing = expected.keySet.diff(got.keySet).size
    val extra = got.keySet.diff(expected.keySet).size
    val wrong = expected.count { case (k, v) => got.get(k).exists(_ != v) }
    val mass = got.values.sum

    println(s"""{"tool":"sketch_stream_100x","n_docs":$n,""" +
      s""""micro_batches":$batches,"cells":${got.size},""" +
      s""""state_bound":${Depth * Width},"missing":$missing,""" +
      s""""extra":$extra,"wrong":$wrong,"mass":$mass,""" +
      s""""expected_mass":${Depth.toLong * gramsPerCorpus},""" +
      s""""engine_sec":$engineSec}""")
    require(missing == 0 && extra == 0 && wrong == 0 &&
      got.size <= Depth * Width &&
      mass == Depth.toLong * gramsPerCorpus && batches >= 8,
      s"planted mismatch: missing=$missing extra=$extra wrong=$wrong " +
        s"batches=$batches")
    println("[sketch_stream_100x] PLANTED ORACLE GREEN")
    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new java.io.File(src))
  }
}
