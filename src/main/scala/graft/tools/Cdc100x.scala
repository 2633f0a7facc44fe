package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the content-defined-chunking
  * family (the Containment100x recipe applied to the r12 chunk tier).
  *
  * Corpus: `nDistinct` distinct texts (20-60 words each, word ids
  * derived from the text id by a fixed affine so texts share NO word
  * with each other → no accidental cross-text chunk collisions),
  * each replicated `reps` times — 500,000 docs / ~20M words at the
  * default arity.
  *
  * Truth: the driver replays the boundary rule per DISTINCT text (the
  * same md5-hash60 arithmetic on 1,000 strings — microseconds) and
  * states the full expected chunk table closed-form; the engine's
  * 500k-doc run must match it row-for-row (`except` both directions).
  * Two laws ride along:
  *  - every doc's spans tile [1, n] (violations counted distributedly);
  *  - the [[graft.Queries.dedupCdcChunks]]-shaped rollup must report
  *    every chunk with EXACTLY `reps × (owners among distinct texts)`
  *    copies — for this corpus owners = 1, so n_copies = reps for every
  *    chunk group (chunk-level dedup finds precisely the planted
  *    replication, nothing else).
  *
  * Usage: runMain graft.tools.Cdc100x [nDocs]
  */
object Cdc100x {
  private val W = 4; private val Div = 16

  /** Driver-side replay of the hash60 boundary rule (MessageDigest md5,
    * first 15 hex digits as a long — the TextOps.hash60 arithmetic). */
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  private def chunksOf(text: String): Seq[(Int, Int, Int)] = {
    val toks = text.trim.split(" ", -1)
    val n = toks.length
    val cuts = (1 to n - W + 1).collect {
      case j if hash60(toks.slice(j - 1, j + W - 1).mkString(" ")) % Div == 0 =>
        j + W - 1
    }
    val ends = if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
    ends.zipWithIndex.map { case (e, i) =>
      val s = if (i == 0) 1 else ends(i - 1) + 1
      (i + 1, s, e)
    }
  }

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
    import spark.implicits._

    // distinct text t: (20 + t % 41) words, word w of text t = "x<t>_<w>"
    // (text-scoped vocabulary: zero shared words across texts)
    def textOf(t: Int): String =
      (0 until (20 + t % 41)).map(w => s"x${t}_$w").mkString(" ")
    val texts = (0 until nDistinct).map(textOf)

    // text id = doc % nDistinct, so every distinct text gets exactly
    // n / nDistinct = reps replicas
    val docs2 = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        transform(sequence(lit(0),
            (lit(19) + pmod(col("id") % nDistinct, lit(41L))).cast("int")), w =>
          concat(lit("x"), (col("id") % nDistinct).cast("string"), lit("_"),
            w.cast("string")))).as("text"))

    val t0 = System.nanoTime()
    val chunks = graft.CacheRegistry.persistTracked(
      TextOps.cdcChunks(docs2, "doc_id", "text", w = W, divisor = Div))
    val nChunks = chunks.count()
    val engineSec = (System.nanoTime() - t0) / 1e9

    // ---- closed-form expected chunk table from the driver replay ----
    val perText = texts.zipWithIndex.map { case (txt, t) =>
      t -> chunksOf(txt).map { case (ci, s, e) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(txt.trim.split(" ", -1).slice(s - 1, e).mkString(" ")
            .getBytes("UTF-8")).map("%02x".format(_)).mkString
        (ci.toLong, s.toLong, e.toLong, (e - s + 1).toLong, md5)
      }
    }.toMap
    val perTextDf = perText.toSeq.flatMap { case (t, cs) =>
      cs.map(c => (t.toLong, c._1, c._2, c._3, c._4, c._5))
    }.toDF("t", "chunk_idx", "start_word", "end_word", "n_words", "chunk_md5")
    val expected = spark.range(n)
      .select(col("id").as("doc"), (col("id") % nDistinct).as("t"))
      .join(broadcast(perTextDf), "t")
      .select(col("doc"), col("chunk_idx"), col("start_word"),
        col("end_word"), col("n_words"), col("chunk_md5"))

    val missing = expected.except(chunks).count()
    val extra = chunks.except(expected).count()

    // law 2: the dedup rollup reports exactly reps copies per group
    val expectedReps = n / nDistinct
    val badGroups = chunks.groupBy(col("chunk_md5"), col("n_words"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_copies") =!= expectedReps ||
        col("n_docs") =!= expectedReps)
      .count()
    val expectedGroups = perText.valuesIterator.map(_.size).sum

    println(s"""{"tool":"cdc_100x","n_docs":$n,"n_distinct":$nDistinct,""" +
      s""""engine_chunks":$nChunks,"missing":$missing,"extra":$extra,""" +
      s""""dedup_groups":$expectedGroups,"bad_groups":$badGroups,""" +
      s""""engine_sec":$engineSec}""")
    require(missing == 0 && extra == 0 && badGroups == 0,
      s"planted-oracle mismatch: missing=$missing extra=$extra bad=$badGroups")
    println("[cdc_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
