package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing run for the CONTAINMENT dedup family
  * (the MinhashPairs100x two-shingle recipe; the DuckDB shared-shingle
  * replay is what kept `dedup_containment` at 10×). Attests
  * `TextOps.containmentPairs` at 100× (500,000 docs) against a
  * closed-form planted truth.
  *
  * Construction — identical corpus to MinhashPairs100x: 100,000 groups
  * of 5 exact duplicates, each doc four tokens = exactly TWO k=3
  * shingles, odd groups sharing their even partner's first shingle:
  *
  *  - within-group pairs: |A∩B| = 2 of 2 ⇒ cont_a = cont_b = 1.0 ≥ 0.8
  *    — all C(5,2)·100k = 1,000,000 pairs MUST be kept (shared-shingle
  *    candidacy is COMPLETE for containment — any pair with overlap
  *    shares a shingle, no band-recall caveat);
  *  - partner-group pairs: |A∩B| = 1 of 2 ⇒ cont = 0.5 both ways —
  *    ALL 50,000·25 = 1,250,000 candidate doc pairs are generated
  *    (they share a shingle) and every one must be REJECTED by the
  *    0.8 gate — the gate is exercised 1.25M times at 100×;
  *  - the closed form also guards hash collisions: if two unrelated
  *    planted shingles collided mod M, containment would change — the
  *    tool derives the expectation from the ACTUAL reduced hashes, so
  *    a collision (none observed) would be modeled, not missed.
  *
  * The tool ASSERTS from the closed form that no shingle bucket
  * exceeds the 1000 cap (occupancy 10: 5 owners + 5 partner docs per
  * shared shingle). cont values are exact IEEE (c/2).
  *
  * Usage: runMain graft.tools.Containment100x [nDocs]
  */
object Containment100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val reps = 5L
    val nGroups = ((n + reps - 1) / reps).toInt
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

    val t0 = System.nanoTime()
    val res = TextOps.containmentPairs(docs, "doc_id", "text",
      minContainment = 0.8)
    val resCached = graft.CacheRegistry.persistTracked(res)
    val nRes = resCached.count()
    val engineSec = (System.nanoTime() - t0) / 1e9

    // ---- closed-form expectation from the ACTUAL reduced hashes ----
    val gh: Array[(Int, Long, Long)] = spark.range(nGroups)
      .select(col("id").cast("int").as("g"),
        TextOps.hash60(concat(lit("a"), expr("id - id % 2"), lit(" b"),
          expr("id - id % 2"), lit(" c"), expr("id - id % 2"))).as("h1"),
        TextOps.hash60(concat(lit("b"), expr("id - id % 2"), lit(" c"),
          expr("id - id % 2"),
          when(col("id") % 2 === 0, concat(lit(" d"), expr("id - id % 2")))
            .otherwise(concat(lit(" e"), col("id"))))).as("h2"))
      .collect().map(r => (r.getInt(0),
        java.lang.Math.floorMod(r.getLong(1), TextOps.HashMod),
        java.lang.Math.floorMod(r.getLong(2), TextOps.HashMod)))
    val sets: Array[Set[Long]] = gh.map { case (_, h1, h2) => Set(h1, h2) }
    // shingle-bucket occupancy: docs per reduced hash value
    val owners = scala.collection.mutable.Map[Long, Int]()
    sets.foreach(_.foreach(h => owners(h) = owners.getOrElse(h, 0) + 1))
    val maxOcc = owners.valuesIterator.max * reps
    require(maxOcc <= 1000,
      s"shingle cap would bind (max occupancy $maxOcc) — " +
        "the closed-form expectation would no longer model the engine")
    // group pairs sharing >=1 shingle, kept iff either containment >= 0.8
    val byH = scala.collection.mutable.Map[Long, List[Int]]()
    for (g <- sets.indices; h <- sets(g))
      byH(h) = g :: byH.getOrElse(h, Nil)
    val crossKept = scala.collection.mutable.Map[(Int, Int), (Double, Double)]()
    var candGroupPairs = 0L
    for (gs <- byH.valuesIterator if gs.lengthCompare(1) > 0) {
      val arr = gs.toArray
      for (i <- arr.indices; j <- (i + 1) until arr.length) {
        val (g1, g2) = (arr(i) min arr(j), arr(i) max arr(j))
        if (g1 != g2 && !crossKept.contains((g1, g2))) {
          candGroupPairs += 1
          val inter = (sets(g1) & sets(g2)).size.toDouble
          val ca = inter / sets(g1).size
          val cb = inter / sets(g2).size
          if (ca >= 0.8 || cb >= 0.8) crossKept((g1, g2)) = (ca, cb)
        }
      }
    }
    val crossPairs = crossKept.toSeq.flatMap { case ((g1, g2), (ca, cb)) =>
      for { i <- 0L until reps; j <- 0L until reps
            a = g1 * reps + i; b = g2 * reps + j
            if a < n && b < n }
        yield (a, b, ca, cb)
    }
    val ids = spark.range(n).select(col("id"), expr(s"id DIV $reps").as("g"))
    val within = ids.as("x").join(ids.as("y"),
        col("x.g") === col("y.g") && $"x.id" < $"y.id")
      .select($"x.id".as("doc_a"), $"y.id".as("doc_b"),
        lit(1.0).as("cont_a"), lit(1.0).as("cont_b"))
    val expected = within.unionByName(
      crossPairs.toDF("doc_a", "doc_b", "cont_a", "cont_b"))

    val nExpected = expected.count()
    val missing = expected.except(resCached).count()
    val extra = resCached.except(expected).count()
    println(s"""{"tool":"containment_100x","n_docs":$n,""" +
      s""""engine_pairs":$nRes,"expected_pairs":$nExpected,""" +
      s""""candidate_group_pairs":$candGroupPairs,""" +
      s""""cross_kept_group_pairs":${crossKept.size},""" +
      s""""max_bucket_occupancy":$maxOcc,""" +
      s""""missing":$missing,"extra":$extra,"engine_sec":$engineSec}""")
    require(missing == 0 && extra == 0 && nRes == nExpected,
      s"planted-oracle mismatch: missing=$missing extra=$extra")
    println("[containment_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
