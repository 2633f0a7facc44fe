package graft.tools

import graft.operators.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing run for the GRAPH tier — the last
  * family without one (r11 verdict #3). Two parts:
  *
  * CONNECTED COMPONENTS at ~1M edges, exact recovery:
  *  - 5,000 PATH components of 100 nodes each (ids c·100 … c·100+99,
  *    edges i→i+1): diameter 99 forces the large-star/small-star
  *    alternation through its O(log diameter) rounds — the regime naive
  *    min-propagation would need 99 rounds for;
  *  - one CELEBRITY star (hub 500000 → 500,000 leaves): the map-side-
  *    combined neighborhood min must absorb a 500k-degree node without
  *    a hot task;
  *  - run against a RELIABLE `checkpointDir` (the executor-loss-
  *    survivable path production needs — previously a documented seam no
  *    run drove; local it exercises the same `checkpoint()` code path
  *    and per-round distributed writes).
  *  Truth is closed-form: path member → its chain's base id, star
  *  member → the hub id. Checked by `except` in BOTH directions.
  *
  * PAGERANK at ~1M edges with PLANTED SINKS, run at FULL precision
  * (`quantize = None` — the 6-dp per-iteration pinning is an oracle-
  * parity device with a scale ceiling: at n = 900k nodes the teleport
  * term (1−d)/n ≈ 1.7·10⁻⁷ QUANTIZES TO ZERO, so corpus-scale runs
  * must not quantize; this tool is what pins that contract):
  *  - ring 0→1→…→599999→0, plus every EVEN ring node feeding one
  *    private sink (300,000 dangling nodes holding ~1/3 of all mass);
  *  - by symmetry the exact distribution collapses to TWO rank classes
  *    (even ring nodes; odd ring nodes = sinks, bit-equal by identical
  *    arithmetic), whose closed-form recurrence the driver replays:
  *    e' = β + d·(o + D/n), o' = s' = β + d·(e/2 + D/n), D = S·s;
  *  - per iteration t = 1..3 the tool asserts the rank-sum law
  *    Σrank = 1 (exact in ℝ under the canonical dangling
  *    redistribution; tolerance covers fp summation) and the two class
  *    values against the driver recurrence.
  *
  * Usage: runMain graft.tools.Graph100x
  */
object Graph100x {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ------------------------------------------------ connected components
    val chains = 5000L; val len = 100L
    val nChainNodes = chains * len
    val leaves = 500000L
    val hub = nChainNodes
    val chainEdges = spark.range(nChainNodes)
      .filter((col("id") + 1) % len =!= 0)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val starEdges = spark.range(leaves)
      .select(lit(hub).as("src"), (col("id") + hub + 1).as("dst"))
    val edges = chainEdges.unionByName(starEdges)
    val nEdges = edges.count()

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_graph100x_ckpt").toString
    val t0 = System.nanoTime()
    val cc = GraphOps.connectedComponents(edges, "src", "dst",
      checkpointDir = Some(ckpt))
    val nCc = cc.count()
    val ccSec = (System.nanoTime() - t0) / 1e9
    val expected = spark.range(nChainNodes)
      .select(col("id").as("node"), (col("id") - col("id") % len).as("component"))
      .unionByName(spark.range(leaves + 1)
        .select((col("id") + hub).as("node"), lit(hub).as("component")))
    val missing = expected.except(cc).count()
    val extra = cc.except(expected).count()
    require(missing == 0 && extra == 0,
      s"cc planted-oracle mismatch: missing=$missing extra=$extra")
    graft.CacheRegistry.releaseAll()

    // ------------------------------------------------------------ pagerank
    val ring = 600000L; val sinks = ring / 2
    val n = ring + sinks
    val ringEdges = spark.range(ring)
      .select(col("id").as("src"), ((col("id") + 1) % ring).as("dst"))
    val sinkEdges = spark.range(ring).filter(col("id") % 2 === 0)
      .select(col("id").as("src"), (lit(ring) + col("id") / 2).as("dst"))
    val prEdges = ringEdges.unionByName(sinkEdges)
    val d = 0.85
    val beta = (1.0 - d) / n.toDouble
    // driver recurrence over the two exact rank classes
    var e0 = 1.0 / n.toDouble; var o0 = e0; var s0 = e0
    var prSec = 0.0
    val sums = (1 to 3).map { t =>
      val dm = sinks.toDouble * s0
      val eN = beta + d * (o0 + dm / n)
      val oN = beta + d * (e0 / 2.0 + dm / n)
      e0 = eN; o0 = oN; s0 = oN
      val tp = System.nanoTime()
      val ranks = GraphOps.pageRank(prEdges, "src", "dst",
        iters = t, quantize = None)
      val classes = ranks.groupBy(col("rank"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("rank")).collect()
      val total = ranks
        .agg(org.apache.spark.sql.functions.sum(col("rank")).as("s"))
        .first().getDouble(0)
      prSec += (System.nanoTime() - tp) / 1e9
      graft.CacheRegistry.releaseAll()
      require(classes.length == 2,
        s"iter $t: expected 2 exact rank classes, got ${classes.length}")
      val (lo, hi) = (classes(0), classes(1))
      val (eRow, oRow) = if (math.abs(lo.getDouble(0) - eN) <
        math.abs(hi.getDouble(0) - eN)) (lo, hi) else (hi, lo)
      require(math.abs(eRow.getDouble(0) - eN) < 1e-12 &&
        eRow.getLong(1) == ring / 2,
        s"iter $t: even-ring class ${eRow.getDouble(0)}×${eRow.getLong(1)} " +
          s"!= $eN×${ring / 2}")
      require(math.abs(oRow.getDouble(0) - oN) < 1e-12 &&
        oRow.getLong(1) == ring / 2 + sinks,
        s"iter $t: odd/sink class ${oRow.getDouble(0)}×${oRow.getLong(1)} " +
          s"!= $oN×${ring / 2 + sinks}")
      require(math.abs(total - 1.0) < 1e-6,
        s"iter $t: rank-sum law broken: $total")
      total
    }

    println(s"""{"tool":"graph_100x","cc_edges":$nEdges,"cc_nodes":$nCc,""" +
      s""""cc_missing":$missing,"cc_extra":$extra,"cc_sec":$ccSec,""" +
      s""""pr_edges":${ring + sinks},"pr_nodes":$n,""" +
      s""""pr_rank_sums":[${sums.mkString(",")}],"pr_sec":$prSec,""" +
      s""""checkpoint":"reliable"}""")
    println("[graph_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
    // reliable-checkpoint dir is a tool-local temp tree
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(ckpt))
  }
}
