package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * - local[$SPARK_GRAFT_CPUS] (default all cores), 32 shuffle partitions,
  *   AQE on — the local-mode stand-in for the multi-executor layout.
  * - a cheap warmup pass at sf0.001 first, so JIT/codegen compilation is
  *   not billed to the first measured query.
  * - results are drained with a full materialization (count of a 1-column
  *   projection would let Parquet prune; we hash one column instead of
  *   collecting) — cheap but forces the whole plan.
  * - SPARK_GRAFT_BENCH_RUNS=N (default 3): repeat the whole suite N times
  *   and report the per-query MEDIAN — run-to-run contention on a shared
  *   box inflates single measurements several-fold (round 2's recorded
  *   bench was a 2.8× artifact of exactly this), and a median of 3 keeps
  *   one contended pass from masquerading as a regression. Set to 1 for
  *   quick iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: exercise scan/join/window/agg codegen paths on the tiny sf
    val warmDir = "/root/testdata/sf0.001"
    Seq("join_agg_revenue", "w2_sessionize", "j2_asof_nearest")
      .foreach(q => try drain(SparkEntry.queries(q)(spark, warmDir))
      catch { case _: Throwable => () })

    // dev-only subset filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 (driver runs unset)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { drain(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // between queries: operator-scoped caches from this query must not
        // occupy storage while the next one is measured
        CacheRegistry.releaseAll()
        // dev-only: live per-query progress for long sweeps (driver runs unset)
        if (sys.env.contains("SPARK_GRAFT_BENCH_PROGRESS"))
          System.err.println(f"[bench] $name%-28s ${if (ok) dt else -1.0}%8.1f s")
        name -> (if (ok) dt else -1.0)
      }
    val passes = Seq.fill(runs)(onePass())
    // median over passes per query; a query that failed any pass stays -1
    val results = passes.head.map(_._1).map { name =>
      val ts = passes.map(_.find(_._1 == name).get._2)
      name -> (if (ts.exists(_ < 0)) -1.0
               else ts.sorted.apply((ts.length - 1) / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
