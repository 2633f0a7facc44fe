package graft.tools

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 100× PLANTED-ORACLE standing run for the image near-dup family
  * (docs/SCALE.md, round 11) — the SimhashPairs100x recipe applied to
  * aHash banding: the DuckDB replay renders every pixel of every image
  * in SQL and is what kept this family at 10× standing, so this attests
  * the ENGINE at 100× against a CLOSED-FORM planted truth instead.
  *
  * Construction. `nDocs` (default 50,000 = 100× the sf0.01 media
  * corpus) 8×8 grayscale PNGs in groups of 10 EXACT duplicates. Each
  * group's image encodes a pseudo-random 64-bit pattern (pixel i =
  * gray 200 if bit i set else 50; bit 0 forced light and bit 63 forced
  * dark so no image is monochrome). With grid=8 each pixel IS one
  * aHash block, and the integer threshold (`blockSum·64 ≥ total`)
  * resolves to exactly "the pixel is light" for any mixed image — so
  * every image's aHash equals its planted pattern BIT-FOR-BIT and the
  * full pairwise Hamming structure is known in closed form from the
  * group patterns:
  *
  *  - within-group pairs: Hamming 0 — all C(10,2)·nGroups pairs MUST
  *    be recovered (pigeonhole recall is complete at
  *    maxHamming 7 ≤ bands − 1 = 7);
  *  - cross-group pairs: found by the same 8-band search replayed
  *    DRIVER-side over the nGroups distinct patterns (complete by the
  *    same pigeonhole) and verified by exact popcount ≤ 7;
  *  - band-colliding pairs beyond Hamming 7 must be REJECTED by the
  *    exact verify — the filter is exercised in both directions.
  *
  * The tool ASSERTS from the closed form that no band bucket exceeds
  * the default 1000 cap (max occupancy = reps × groups sharing the
  * 8-bit band value), so the complete-recovery expectation provably
  * models the engine.
  *
  * Usage: runMain graft.tools.ImageNearDup100x [nDocs]
  */
object ImageNearDup100x {
  /** splitmix64 finalizer — the group-pattern generator. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The planted 64-bit pattern for group `g`: mixed by construction
    * (bit 0 light, bit 63 dark). Groups come in PARTNER PAIRS — an odd
    * group's pattern is its even partner's with ≤3 bits (drawn from
    * positions 1..62, so the mixed invariant holds) flipped — planting
    * TRUE near-duplicate cross-group pairs at Hamming 1-3 that the
    * banded search must recover, alongside the unrelated-group pairs
    * (popcount ≤ 7 between two splitmix patterns ~never happens) that
    * the exact verify must reject. */
  def groupPattern(g: Long): Long = {
    val base = (mix64(g & ~1L) | 1L) & ~(1L << 63)
    if ((g & 1L) == 0L) base
    else {
      val m = mix64(g)
      val flips = (0 until 3).map(k =>
        1 + java.lang.Math.floorMod(m >>> (8 * k), 62L).toInt)
      flips.foldLeft(base)((p, b) => p ^ (1L << b))
    }
  }

  /** 8×8 grayscale PNG whose pixel i (row-major) is 200/50 per bit i. */
  def renderPng(pattern: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 64) {
      val v = if (((pattern >>> i) & 1L) == 1L) 200 else 50
      img.getRaster.setSample(i % 8, i / 8, 0, v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val reps = 10L
    val nGroups = ((n + reps - 1) / reps).toInt
    val bands = 8; val maxHamming = 7
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    // executors render per row (PNG encode of an 8×8 image is ~µs);
    // identical group members re-encode identically — determinism is
    // the point, not render thrift
    val media = spark.range(n).repartition(32)
      .map(id => Row(id, renderPng(groupPattern(id / reps))))(enc)

    val t0 = System.nanoTime()
    val res = MultimodalOps.imageNearDupPairs(media)
      .select(col("id_a"), col("id_b"), col("hamming"))
    val resCached = graft.CacheRegistry.persistTracked(res)
    val nRes = resCached.count()
    val engineSec = (System.nanoTime() - t0) / 1e9

    // ---- closed-form expectation (driver-side, nGroups patterns) ----
    val pat = (0 until nGroups).map(g => g -> groupPattern(g)).toArray
    def bandKey(h: Long, b: Int): Long = (h >>> (b * 8)) & 0xffL
    val maxGroupsPerBucket = (0 until bands).map { b =>
      pat.groupBy { case (_, h) => bandKey(h, b) }
        .valuesIterator.map(_.length).max
    }.max
    require(maxGroupsPerBucket * reps <= 1000,
      s"cap would bind (max occupancy ${maxGroupsPerBucket * reps}) — " +
        "the closed-form expectation would no longer model the engine")
    val hs = pat.toMap
    val crossGroups = scala.collection.mutable.Set[(Int, Int)]()
    var bandCandidates = 0L
    for (b <- 0 until bands) {
      pat.groupBy { case (_, h) => bandKey(h, b) }
        .valuesIterator.filter(_.length > 1).foreach { bucket =>
          for (i <- bucket.indices; j <- (i + 1) until bucket.length) {
            bandCandidates += 1
            val (g1, g2) = (bucket(i)._1 min bucket(j)._1,
              bucket(i)._1 max bucket(j)._1)
            if (java.lang.Long.bitCount(hs(g1) ^ hs(g2)) <= maxHamming)
              crossGroups += ((g1, g2))
          }
        }
    }
    val crossPairs = crossGroups.toSeq.flatMap { case (g1, g2) =>
      val ham = java.lang.Long.bitCount(hs(g1) ^ hs(g2)).toLong
      for { i <- 0L until reps; j <- 0L until reps
            a = g1 * reps + i; b = g2 * reps + j
            if a < n && b < n }   // the trailing group may be partial
        yield (a, b, ham)
    }
    val ids = spark.range(n).select(col("id"), expr(s"id DIV $reps").as("g"))
    val within = ids.as("x").join(ids.as("y"),
        col("x.g") === col("y.g") && $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"), lit(0L).as("hamming"))
    val expected = within.unionByName(
      crossPairs.toDF("id_a", "id_b", "hamming"))

    val nExpected = expected.count()
    val missing = expected.except(resCached).count()
    val extra = resCached.except(expected).count()
    println(s"""{"tool":"image_neardup_100x","n_docs":$n,"bands":$bands,""" +
      s""""max_hamming":$maxHamming,"engine_pairs":$nRes,""" +
      s""""expected_pairs":$nExpected,"cross_group_pairs":${crossPairs.size},""" +
      s""""band_candidate_group_pairs":$bandCandidates,""" +
      s""""max_bucket_occupancy":${maxGroupsPerBucket * reps},""" +
      s""""missing":$missing,"extra":$extra,"engine_sec":$engineSec}""")
    require(missing == 0 && extra == 0 && nRes == nExpected,
      s"planted-oracle mismatch: missing=$missing extra=$extra")
    println("[image_neardup_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
