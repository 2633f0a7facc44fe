package graft.tools

import graft.operators.{LshIndexIO, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the INCREMENTAL dedup probe
  * ([[LshIndexIO.probe]] / [[TextOps.minhashProbePairs]]) — the
  * snapshot-admission path, which the oracle row pins only at sf scale.
  *
  * Corpus: the [[MinhashPairs100x]] construction verbatim (100k groups
  * of 5 exact copies, partner groups sharing one of two shingles), split
  * SNAPSHOT-style: docs with `id % 5 == 4` (one copy per group, 20% of
  * the corpus) are the NEW batch; the rest are the indexed snapshot.
  * Every group then contributes new×old pairs (the batch copy against
  * its 4 indexed siblings) and every band-colliding partner-group pair
  * contributes one new×new pair (the two batch copies) — both probe
  * branches load-bearing at 100×.
  *
  * Expectation is CLOSED FORM: the full-corpus planted pair set (same
  * signature/band replay as MinhashPairs100x, cap provably non-binding)
  * restricted to new-touching pairs and re-oriented to the probe's
  * `(doc_new, doc_match, match_is_new)` convention — the operator's
  * "incremental ≡ from-scratch, restricted" semantics pin, asserted
  * exactly at 500k docs.
  *
  * Also MEASURES the admission saving the design claims: `probe_sec`
  * (load persisted index + batch shingle pass + band join) vs
  * `full_sec` (re-pair the whole corpus from text) — the SCALE.md
  * number for "snapshot N+1 does not pay for snapshot N".
  *
  * `newMod` (second arg, default 5, must be a multiple of 5) sets the
  * snapshot ratio: a doc is NEW iff `id % newMod == newMod - 1`, so 5 →
  * 20% new (every group's last copy) and 25 → 4% new (a realistic
  * snapshot ratio: the last copy of every 5th group). The closed form
  * restricts by the same predicate either way.
  *
  * Usage: runMain graft.tools.IncDedup100x [nDocs] [newMod]
  */
object IncDedup100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val newMod = args.drop(1).headOption.map(_.toLong).getOrElse(5L)
    require(newMod % 5 == 0, s"newMod must be a multiple of 5, got $newMod")
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

    def textExpr = {
      val base = expr("(id DIV 5) - (id DIV 5) % 2")
      val g = expr("id DIV 5")
      concat(lit("a"), base, lit(" b"), base, lit(" c"), base,
        when(g % 2 === 0, concat(lit(" d"), base))
          .otherwise(concat(lit(" e"), g)))
    }
    val docs = spark.range(n).select(col("id").as("doc_id"),
      textExpr.as("text"))
    val oldDocs = docs.filter(col("doc_id") % newMod =!= (newMod - 1))
    val newDocs = docs.filter(col("doc_id") % newMod === (newMod - 1))

    // ---- engine: build index over the snapshot, probe the batch ----
    val idxDir = java.nio.file.Files.createTempDirectory("inc100x").toString
    val tb = System.nanoTime()
    val nBands = LshIndexIO.build(oldDocs, "doc_id", "text", idxDir)
    val buildSec = (System.nanoTime() - tb) / 1e9
    val tp = System.nanoTime()
    val probed = graft.CacheRegistry.persistTracked(
      LshIndexIO.probe(spark, idxDir, newDocs, "doc_id", "text"))
    val nProbed = probed.count()
    val probeSec = (System.nanoTime() - tp) / 1e9

    // ---- reference cost: full from-scratch re-pair ----
    val tf = System.nanoTime()
    val nFull = TextOps.minhashLshPairs(docs, "doc_id", "text").count()
    val fullSec = (System.nanoTime() - tf) / 1e9
    graft.CacheRegistry.releaseAll()

    // ---- closed-form expectation (MinhashPairs100x replay) ----
    val gh: Array[(Int, Long, Long)] = spark.range(nGroups)
      .select(col("id").cast("int").as("g"),
        TextOps.hash60(concat(lit("a"), expr("id - id % 2"), lit(" b"),
          expr("id - id % 2"), lit(" c"), expr("id - id % 2"))).as("h1"),
        TextOps.hash60(concat(lit("b"), expr("id - id % 2"), lit(" c"),
          expr("id - id % 2"),
          when(col("id") % 2 === 0, concat(lit(" d"), expr("id - id % 2")))
            .otherwise(concat(lit(" e"), col("id"))))).as("h2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
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
    val buckets = (0 until bands).map { b =>
      (0 until nGroups).groupBy(g => bandKey(sigs(g), b))
    }
    val maxOcc = buckets.iterator.flatMap(_.valuesIterator.map(_.length)).max
    require(maxOcc * reps <= TextOps.DefaultMaxBandBucket,
      s"cap would bind (max occupancy ${maxOcc * reps})")
    def est(g1: Int, g2: Int): Double =
      sigs(g1).indices.count(i => sigs(g1)(i) == sigs(g2)(i)).toDouble / numHashes
    val collide = scala.collection.mutable.Set[(Int, Int)]()
    for (bmap <- buckets; bucket <- bmap.valuesIterator if bucket.length > 1)
      for (i <- bucket.indices; j <- (i + 1) until bucket.length)
        collide += ((bucket(i) min bucket(j), bucket(i) max bucket(j)))
    val crossGroups = collide.iterator
      .map { case p @ (g1, g2) => p -> est(g1, g2) }
      .filter(_._2 >= minEst).toMap

    def isNew(id: Long) = id % newMod == newMod - 1
    // within-group: each NEW copy against its 4 indexed siblings (a
    // group's last copy is new iff its id clears the newMod predicate)
    val withinExp = spark.range(n / reps).select(
      (col("id") * reps).as("g0"))
      .filter((col("g0") + reps - 1) % newMod === (newMod - 1))
      .select(explode(sequence(lit(0L), lit(reps - 2))).as("i"), col("g0"))
      .select((col("g0") + reps - 1).as("doc_new"),
        (col("g0") + col("i")).as("doc_match"),
        lit(false).as("match_is_new"), lit(1.0).as("est_jaccard"))
    // cross-group: all 25 copy pairs per colliding group pair, restricted
    // to new-touching and re-oriented
    val crossExp = crossGroups.toSeq.flatMap { case ((g1, g2), e) =>
      for { i <- 0L until reps; j <- 0L until reps
            a = g1 * reps + i; b = g2 * reps + j
            if a < n && b < n && (isNew(a) || isNew(b)) }
        yield if (isNew(a) && isNew(b)) (a min b, a max b, true, e)
        else if (isNew(a)) (a, b, false, e)
        else (b, a, false, e)
    }
    val expected = withinExp.unionByName(
      crossExp.toDF("doc_new", "doc_match", "match_is_new", "est_jaccard"))
    val nExpected = expected.count()
    val missing = expected.except(probed).count()
    val extra = probed.except(expected).count()
    val newNewGroups = crossGroups.size

    println(s"""{"tool":"inc_dedup_100x","n_docs":$n,"n_new":${n / newMod},""" +
      s""""index_band_rows":$nBands,"engine_pairs":$nProbed,""" +
      s""""expected_pairs":$nExpected,"cross_group_pairs":$newNewGroups,""" +
      s""""max_bucket_occupancy":${maxOcc * reps},""" +
      s""""missing":$missing,"extra":$extra,"build_sec":$buildSec,""" +
      s""""probe_sec":$probeSec,"full_repair_pairs":$nFull,""" +
      s""""full_repair_sec":$fullSec}""")
    require(missing == 0 && extra == 0 && nProbed == nExpected,
      s"planted-oracle mismatch: missing=$missing extra=$extra")
    println("[inc_dedup_100x] PLANTED ORACLE GREEN (incremental probe)")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
