package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing run for the MinHash+LSH pair family —
  * the last banded family without one (SimhashPairs100x covers simhash,
  * ImageNearDup100x the image tier; the DuckDB banded replay keeps the
  * oracle row at 10×). Attests `TextOps.minhashLshPairs` at 100×
  * (500,000 docs) against a CLOSED-FORM planted truth.
  *
  * Construction. 100,000 groups of 5 exact duplicates; each group's doc
  * is FOUR tokens → exactly TWO k=3 shingles. Groups come in PARTNER
  * PAIRS: an odd group shares its even partner's first shingle and
  * differs in the second (true set Jaccard 1/3) — so the est-Jaccard
  * gate and the band recall are both exercised on genuine near-dups,
  * not just exact copies. Because every per-doc shingle set has exactly
  * two members, the whole chain is closed-form from the 200k distinct
  * shingle hashes:
  *
  *  - sig_i = min over the 2 shingle hashes of (a_i·h + b_i) mod M —
  *    replayed driver-side with the engine's own constants;
  *  - band keys = the positional rolling hash over sig rows — replayed
  *    driver-side;
  *  - within-group pairs (est 1.0, all bands equal): all C(5,2)·100k =
  *    1,000,000 pairs MUST be recovered;
  *  - cross-group pairs: EVERY group pair colliding on ≥1 band key
  *    (partner pairs whose min-agreement covers a whole band, plus rare
  *    random rolling-hash collisions) with est = eq/16 ≥ 0.25 — found
  *    by the same bucketing replayed over the 100k signatures;
  *  - band-colliding pairs BELOW the est gate must be rejected.
  *
  * The tool ASSERTS from the closed form that no (band, key) bucket
  * exceeds the default 1000 cap, so complete recovery provably models
  * the engine. est_jaccard = eq/16 is exact IEEE on both sides.
  *
  * Usage: runMain graft.tools.MinhashPairs100x [nDocs]
  */
object MinhashPairs100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val reps = 5L
    val nGroups = ((n + reps - 1) / reps).toInt
    val numHashes = 16; val bands = 4; val rowsPerBand = 4
    val minEst = 0.25
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // even group g: "a<g> b<g> c<g> d<g>"; odd: partner prefix + "e<g>"
    def textExpr = {
      val base = expr("(id DIV 5) - (id DIV 5) % 2") // even partner id
      val g = expr("id DIV 5")
      concat(lit("a"), base, lit(" b"), base, lit(" c"), base,
        when(g % 2 === 0, concat(lit(" d"), base))
          .otherwise(concat(lit(" e"), g)))
    }
    val docs = spark.range(n).select(col("id").as("doc_id"),
      textExpr.as("text"))

    val t0 = System.nanoTime()
    val res = TextOps.minhashLshPairs(docs, "doc_id", "text")
    val resCached = graft.CacheRegistry.persistTracked(res)
    val nRes = resCached.count()
    val engineSec = (System.nanoTime() - t0) / 1e9

    // ---- closed-form expectation ----
    // the 2 shingle hashes per group, through the SAME hash kernel
    val gh: Array[(Int, Long, Long)] = spark.range(nGroups)
      .select(col("id").cast("int").as("g"),
        TextOps.hash60(concat(lit("a"), expr("id - id % 2"), lit(" b"),
          expr("id - id % 2"), lit(" c"), expr("id - id % 2"))).as("h1"),
        TextOps.hash60(concat(lit("b"), expr("id - id % 2"), lit(" c"),
          expr("id - id % 2"),
          when(col("id") % 2 === 0, concat(lit(" d"), expr("id - id % 2")))
            .otherwise(concat(lit(" e"), col("id"))))).as("h2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // the engine's hv is hash60 REDUCED mod M (ShingleHash60's contract —
    // also what keeps h·a inside a long here)
    def sigOf(h1raw: Long, h2raw: Long): Array[Long] = {
      val h1 = java.lang.Math.floorMod(h1raw, TextOps.HashMod)
      val h2 = java.lang.Math.floorMod(h2raw, TextOps.HashMod)
      Array.tabulate(numHashes) { i =>
        def f(h: Long) = java.lang.Math.floorMod(
          h * TextOps.MinhashA(i) + TextOps.MinhashB(i), TextOps.HashMod)
        math.min(f(h1), f(h2))
      }
    }
    val sigs: Array[Array[Long]] = gh.map { case (_, h1, h2) => sigOf(h1, h2) }
    def bandKey(sig: Array[Long], b: Int): Long =
      (1 until rowsPerBand).foldLeft(sig(b * rowsPerBand)) { (acc, r) =>
        java.lang.Math.floorMod(acc * 31 + sig(b * rowsPerBand + r),
          TextOps.HashMod)
      }
    // bucket groups per (band, key); assert the engine's cap never binds
    val buckets = (0 until bands).map { b =>
      (0 until nGroups).groupBy(g => bandKey(sigs(g), b))
    }
    val maxOcc = buckets.iterator.flatMap(_.valuesIterator.map(_.length)).max
    require(maxOcc * reps <= TextOps.DefaultMaxBandBucket,
      s"cap would bind (max occupancy ${maxOcc * reps}) — " +
        "the closed-form expectation would no longer model the engine")
    // every band-colliding group pair — the shared candidate universe of
    // BOTH chains; the est gate (minhash) and the exact set-Jaccard gate
    // (gated chain) then select their own subsets from it
    def est(g1: Int, g2: Int): Double =
      sigs(g1).indices.count(i => sigs(g1)(i) == sigs(g2)(i)).toDouble / numHashes
    val collide = scala.collection.mutable.Set[(Int, Int)]()
    var bandCandidates = 0L
    for (bmap <- buckets; bucket <- bmap.valuesIterator if bucket.length > 1) {
      for (i <- bucket.indices; j <- (i + 1) until bucket.length) {
        bandCandidates += 1
        collide += ((bucket(i) min bucket(j), bucket(i) max bucket(j)))
      }
    }
    val crossGroups = collide.iterator
      .map { case p @ (g1, g2) => p -> est(g1, g2) }
      .filter(_._2 >= minEst).toMap
    val crossPairs = crossGroups.toSeq.flatMap { case ((g1, g2), e) =>
      for { i <- 0L until reps; j <- 0L until reps
            a = g1 * reps + i; b = g2 * reps + j
            if a < n && b < n }
        yield (a, b, e)
    }
    val ids = spark.range(n).select(col("id"), expr(s"id DIV $reps").as("g"))
    val within = ids.as("x").join(ids.as("y"),
        col("x.g") === col("y.g") && $"x.id" < $"y.id")
      .select($"x.id".as("doc_a"), $"y.id".as("doc_b"),
        lit(1.0).as("est_jaccard"))
    val expected = within.unionByName(
      crossPairs.toDF("doc_a", "doc_b", "est_jaccard"))

    val nExpected = expected.count()
    val missing = expected.except(resCached).count()
    val extra = resCached.except(expected).count()
    val partnerFound = crossGroups.keysIterator
      .count { case (g1, g2) => g2 == g1 + 1 && g1 % 2 == 0 }

    // ---- phase 2: the GATED-JACCARD chain on the same corpus ----
    // same band candidates, exact set-Jaccard ≥ 0.2 verify: partner
    // pairs score inter/(2+2−inter) = 1/3 from the actual reduced hash
    // sets (hash shares modeled, as in Containment100x), so EVERY
    // band-colliding partner pair must be KEPT while band collisions
    // between unrelated groups (0 shared shingles) must be REJECTED
    val tj0 = System.nanoTime()
    val resJ = graft.CacheRegistry.persistTracked(
      TextOps.ngramJaccardPairsGated(docs, "doc_id", "text"))
    val nResJ = resJ.count()
    val engineJSec = (System.nanoTime() - tj0) / 1e9
    val sets: Array[Set[Long]] = gh.map { case (_, h1, h2) =>
      Set(java.lang.Math.floorMod(h1, TextOps.HashMod),
        java.lang.Math.floorMod(h2, TextOps.HashMod))
    }
    val crossJ = collide.iterator.map { case p @ (g1, g2) =>
      val inter = (sets(g1) & sets(g2)).size
      p -> (inter.toDouble / (sets(g1).size + sets(g2).size - inter))
    }.filter(_._2 >= 0.2).toMap
    val crossPairsJ = crossJ.toSeq.flatMap { case ((g1, g2), jac) =>
      for { i <- 0L until reps; j <- 0L until reps
            a = g1 * reps + i; b = g2 * reps + j
            if a < n && b < n }
        yield (a, b, jac)
    }
    val expectedJ = ids.as("x").join(ids.as("y"),
        col("x.g") === col("y.g") && $"x.id" < $"y.id")
      .select($"x.id".as("doc_a"), $"y.id".as("doc_b"),
        lit(1.0).as("jaccard"))
      .unionByName(crossPairsJ.toDF("doc_a", "doc_b", "jaccard"))
    val nExpectedJ = expectedJ.count()
    val missingJ = expectedJ.except(resJ).count()
    val extraJ = resJ.except(expectedJ).count()
    println(s"""{"tool":"minhash_pairs_100x","n_docs":$n,"bands":$bands,""" +
      s""""num_hashes":$numHashes,"min_est":$minEst,"engine_pairs":$nRes,""" +
      s""""expected_pairs":$nExpected,"cross_group_pairs":${crossGroups.size},""" +
      s""""partner_group_pairs_found":$partnerFound,""" +
      s""""band_candidate_group_pairs":$bandCandidates,""" +
      s""""max_bucket_occupancy":${maxOcc * reps},""" +
      s""""missing":$missing,"extra":$extra,"engine_sec":$engineSec,""" +
      s""""gated_engine_pairs":$nResJ,"gated_expected_pairs":$nExpectedJ,""" +
      s""""gated_cross_group_pairs":${crossJ.size},""" +
      s""""gated_missing":$missingJ,"gated_extra":$extraJ,""" +
      s""""gated_engine_sec":$engineJSec}""")
    require(missing == 0 && extra == 0 && nRes == nExpected,
      s"planted-oracle mismatch: missing=$missing extra=$extra")
    require(missingJ == 0 && extraJ == 0 && nResJ == nExpectedJ,
      s"gated-jaccard planted-oracle mismatch: missing=$missingJ extra=$extraJ")
    println("[minhash_pairs_100x] PLANTED ORACLE GREEN (minhash + gated jaccard)")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
