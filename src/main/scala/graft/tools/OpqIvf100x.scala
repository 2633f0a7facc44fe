package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the OPQ×IVF probe-pruned ANN tier
  * (docs/SCALE.md, round 10) — the [[SimhashPairs100x]] recipe applied
  * to the vector family: 50,000 planted vectors (100× the sf0.01
  * embeddings table) in 25 orthogonal-axis clusters of 2,000, the full
  * build→encode→probe→rerank artifact lineage, and the search output
  * compared EXACTLY (ids, ranks, round-6 sims) against a driver-side
  * brute-force over the same planted doubles. The cluster margins make
  * the true top-3 provably same-cluster and provably inside the
  * asymmetric cut (rerank = cluster size), so any engine divergence —
  * rotation plumbing, cell routing, residual reconstruction, pruning —
  * breaks the exact comparison. No DuckDB replay: the closed form IS
  * the oracle, which is what lets the vector family run at 100×.
  *
  * Usage: runMain graft.tools.OpqIvf100x [nVecs]
  */
object OpqIvf100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val clusters = 25
    val k = 3
    // ceiling: fuller clusters hold ⌈n/clusters⌉ members when
    // n % clusters ≠ 0, and every one must survive the asymmetric cut
    val rerank = ((n + clusters - 1) / clusters).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planted = spark.range(n).select(col("id").as("vec_id"),
      graft.Queries.opqIvfPlanted(col("id")).as("pv"))
    val dir = java.nio.file.Files.createTempDirectory("opqivf_100x").toString

    val t0 = System.nanoTime()
    require(graft.operators.AnnIndexIO.buildOpqIvf(
      planted, "vec_id", "pv", dir, nCells = clusters))
    val buildSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val got = graft.operators.AnnIndexIO.searchOpqIvf(spark, dir, planted,
        "vec_id", "pv", col("v_id") < 10, k = k, nprobe = 4, rerank = rerank)
      .select(col("q_id"), col("rank"), col("n_id"),
        (round(col("sim"), 6) + 0.0).as("sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val searchSec = (System.nanoTime() - t1) / 1e9

    // driver-side brute force over the SAME planted doubles, same
    // arithmetic order (index-order sums, per-element normalize, HALF_UP
    // round-6) — candidates restricted to the query's own cluster, which
    // the margins make provably sufficient (cross-cluster cosine ≤ 1e-4)
    def vec(i: Long): Array[Double] = {
      val v = new Array[Double](64)
      v((i % 25).toInt) = 100.0
      v((40 + i % 8).toInt) = 0.001 * (1 + i % 11)
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nn)
    }
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (0L until 10L).flatMap { qid =>
      val qv = vec(qid)
      val sims = (qid % 25 until n by 25).filter(_ != qid).map { i =>
        val v = vec(i)
        var s = 0.0; var j = 0
        while (j < 64) { s += qv(j) * v(j); j += 1 }
        (i, s)
      }
      sims.sortBy { case (i, s) => (-s, i) }.take(k).zipWithIndex
        .map { case ((i, s), r) => (qid, r + 1, i, q6(s)) }
    }

    println(s"""{"tool":"opq_ivf_100x","n_vecs":$n,"clusters":$clusters,""" +
      s""""rerank":$rerank,"rows":${got.size},"build_sec":$buildSec,""" +
      s""""search_sec":$searchSec,"match":${got == want}}""")
    require(got == want,
      s"planted-oracle mismatch:\nengine=$got\nexpected=$want")
    println("[opq_ivf_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
