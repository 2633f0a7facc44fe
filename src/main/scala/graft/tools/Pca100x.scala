package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the PCA family (docs/SCALE.md,
  * round 10) — the [[OpqIvf100x]] recipe applied to the moment-pass
  * fit: 2,000,000 planted 64-dim vectors (100× the sf0.01 embeddings
  * table) through the REAL one-pass moment aggregate + eigSym +
  * projection, compared EXACTLY against the closed form the planted
  * construction guarantees (Queries.pcaPlanted: exactly-orthogonal
  * mod-4 sign patterns, power-of-two values ⇒ every empirical moment
  * exact ⇒ eigenvalues exactly (16, 4), components exactly the planted
  * axes, projections exactly the signed planted coordinates). No
  * replay: the closed form IS the oracle. This is also the regression
  * standing for the ArrayMean iterator fix — the indexed-Seq O(len²)
  * bug made exactly this pass hang at 10×.
  *
  * Usage: runMain graft.tools.Pca100x [nVecs]
  */
object Pca100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    require(n % 4 == 0, "nVecs must be divisible by 4 (balanced mod-4 classes)")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planted = spark.range(n).select(col("id").as("vec_id"),
      graft.Queries.pcaPlanted(col("id")).as("pv"))

    val t0 = System.nanoTime()
    val m = graft.operators.VectorOps.pcaFit(planted, "pv", k = 2)
    val fitSec = (System.nanoTime() - t0) / 1e9

    require(m.eigenvalues.toSeq == Seq(16.0, 4.0),
      s"eigenvalues drifted: ${m.eigenvalues.toSeq}")
    def axis(c: Array[Double]): Int = c.indexWhere(_ != 0.0)
    require(m.components.map(axis).toSeq == Seq(5, 17) &&
      m.components.forall(c => c(axis(c)) == 1.0 && c.count(_ != 0.0) == 1),
      "components are not the exact planted axes")

    val t1 = System.nanoTime()
    val got = graft.operators.VectorOps.pcaApply(planted, "pv", m)
      .select(col("vec_id"), col("p1"), col("p2"))
      .filter(col("vec_id") < 1000 || col("vec_id") >= n - 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val applySec = (System.nanoTime() - t1) / 1e9
    val want = got.map(_._1).map { i =>
      val s0 = if (i % 2 == 0) 1.0 else -1.0
      val s1 = if (i % 4 < 2) 1.0 else -1.0
      (i, 4.0 * s0, 2.0 * s1)
    }
    println(s"""{"tool":"pca_100x","n_vecs":$n,"fit_sec":$fitSec,""" +
      s""""apply_probe_sec":$applySec,"probe_rows":${got.size},""" +
      s""""match":${got == want}}""")
    require(got == want, "planted projection mismatch")
    println("[pca_100x] PLANTED ORACLE GREEN")
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
