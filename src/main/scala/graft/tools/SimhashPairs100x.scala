package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing run for the simhash near-dup PAIR family
  * (docs/SCALE.md, round 10): the DuckDB replay of a banded pair search
  * is quadratic-ish and became the bottleneck that kept the LSH families
  * at 10× standing, so this attests the ENGINE at 100× against a
  * CLOSED-FORM planted truth instead — no replay at all.
  *
  * Construction. 500,000 docs (100× the sf0.01 documents corpus) in
  * 100,000 groups of 5 EXACT duplicates, each doc a single token
  * `tok<g>`. A one-token doc's simhash is exactly `hash60(token)` (every
  * bit gets one ±1 vote), so the full pairwise Hamming structure is
  * known in closed form from the 100k distinct token hashes:
  *
  *  - within-group pairs: Hamming 0 — all C(5,2)·100k = 1,000,000 pairs
  *    MUST be recovered (pigeonhole recall is complete for
  *    maxHamming ≤ bands − 1);
  *  - cross-group pairs: found by the same banded search replayed
  *    DRIVER-side over the 100k hashes (4 bands × 15 bits covers all 60
  *    bits, so driver recall is complete too) and verified by exact
  *    popcount ≤ maxHamming;
  *  - everything else: candidates that DO band-collide (hundreds of
  *    thousands of cross-group doc pairs at 15-bit keys) must be
  *    REJECTED by the exact Hamming verify — the filter is non-trivial
  *    in both directions.
  *
  * Band arity is the scale lever: the sf-scale default (6 bands, 10-bit
  * keys) would put ~500 docs in every band bucket at 500k docs and the
  * rank cap would bind; 4 bands × 15 bits (same code path, same
  * pigeonhole law at maxHamming 3) keeps mean occupancy ~15 ≪ the 1000
  * cap, which the tool ASSERTS from the closed form so the expectation
  * provably models the engine.
  *
  * Usage: runMain graft.tools.SimhashPairs100x [nDocs]
  */
object SimhashPairs100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val reps = 5L
    // ceiling so a non-multiple-of-5 nDocs still models the trailing
    // PARTIAL group (its docs band-join like any others; the
    // closed-form expectation must include its token hash too)
    val nGroups = ((n + reps - 1) / reps).toInt
    val bands = 4; val maxHamming = 3
    val bandBits = 60 / bands
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("tok"), expr(s"id DIV $reps")).as("text"))

    val t0 = System.nanoTime()
    val res = TextOps.simhashNearDupPairs(docs, "doc_id", "text",
      bands = bands, maxHamming = maxHamming)
    val resCached = graft.CacheRegistry.persistTracked(res)
    val nRes = resCached.count()
    val engineSec = (System.nanoTime() - t0) / 1e9

    // ---- closed-form expectation ----
    // group hashes through the SAME kernel the operator tokenizes with
    val gh = spark.range(nGroups).select(col("id").cast("int").as("g"),
        TextOps.hash60(concat(lit("tok"), col("id"))).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // cap never binds: bucket occupancy = reps × groups sharing the key
    val maxGroupsPerBucket = (0 until bands).map { b =>
      gh.groupBy { case (_, h) => (h >>> (b * bandBits)) & ((1L << bandBits) - 1) }
        .valuesIterator.map(_.length).max
    }.max
    require(maxGroupsPerBucket * reps <= TextOps.DefaultMaxBandBucket,
      s"cap would bind (max occupancy ${maxGroupsPerBucket * reps}) — " +
        "the closed-form expectation would no longer model the engine")
    // driver-side banded search over the group hashes (complete for
    // maxHamming ≤ bands − 1, same pigeonhole as the engine)
    val hs = gh.toMap
    val crossGroups = scala.collection.mutable.Set[(Int, Int)]()
    var bandCandidates = 0L
    for (b <- 0 until bands) {
      gh.groupBy { case (_, h) => (h >>> (b * bandBits)) & ((1L << bandBits) - 1) }
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
    println(s"""{"tool":"simhash_pairs_100x","n_docs":$n,"bands":$bands,""" +
      s""""max_hamming":$maxHamming,"engine_pairs":$nRes,""" +
      s""""expected_pairs":$nExpected,"cross_group_pairs":${crossPairs.size},""" +
      s""""band_candidate_group_pairs":$bandCandidates,""" +
      s""""max_bucket_occupancy":${maxGroupsPerBucket * reps},""" +
      s""""missing":$missing,"extra":$extra,"engine_sec":$engineSec}""")
    require(missing == 0 && extra == 0 && nRes == nExpected,
      s"planted-oracle mismatch: missing=$missing extra=$extra")
    println("[simhash_pairs_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
