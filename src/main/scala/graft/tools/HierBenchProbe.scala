package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split the served hier-ANN cost into build / first search /
  * repeat search on a given sf dir — the shipped `ann_ivf_pq_hier_topk`
  * benches as one opaque number, and this separates the quantizer fit +
  * 10⁴-cell partitioned write (amortized at scale) from the per-query
  * probe path (the steady-state cost a 100 TB deployment pays).
  * Run: `runMain graft.tools.HierBenchProbe <sfDir>`. */
object HierBenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val nCells = graft.Queries.annIvfPqHierK1 * graft.Queries.annIvfPqHierK2
    val idx = java.nio.file.Files.createTempDirectory("hier_probe").toString
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("build") {
      graft.operators.AnnIndexIO.buildAuto(emb, "vec_id", "embedding", idx,
        nCells = nCells)
    }
    def once(tag: String): Unit = time(tag) {
      val out = graft.operators.AnnIndexIO.searchAuto(spark, idx, emb,
        "vec_id", "embedding", col("v_id") < 10, k = 3,
        nprobe = graft.Queries.annIvfPqHierNprobe,
        probeSupers = graft.Queries.annIvfPqHierProbeSupers)
      out.write.mode("overwrite").format("noop").save()
      graft.CacheRegistry.releaseAll()
    }
    once("search-1"); once("search-2"); once("search-3")
    // sub-step split of one search
    time("quantizer-load") {
      graft.operators.AnnIndexIO.hierModelFromDF(
        spark.read.parquet(s"$idx/quantizer"))
    }
    time("index-list+count") {
      spark.read.parquet(s"$idx/index").count()
    }
    time("index-list-again") {
      spark.read.parquet(s"$idx/index").count()
    }
    val model = graft.operators.AnnIndexIO.hierModelFromDF(
      spark.read.parquet(s"$idx/quantizer"))
    val index = spark.read.parquet(s"$idx/index")
    val v = graft.CacheRegistry.persistTracked(
      graft.operators.VectorOps.normalized(emb, "vec_id", "embedding")
        .select(col("vec_id").as("v_id"), col("vn")))
    time("probe-join-only") {
      graft.operators.VectorOps.ivfPqSearchHierNormalized(model, index, v,
        col("v_id") < 10, 3, graft.Queries.annIvfPqHierProbeSupers,
        graft.Queries.annIvfPqHierNprobe, 10)
        .write.mode("overwrite").format("noop").save()
    }
    time("probe-join-warm") {
      graft.operators.VectorOps.ivfPqSearchHierNormalized(model, index, v,
        col("v_id") < 10, 3, graft.Queries.annIvfPqHierProbeSupers,
        graft.Queries.annIvfPqHierNprobe, 10)
        .write.mode("overwrite").format("noop").save()
    }
    val df3 = graft.operators.VectorOps.ivfPqSearchHierNormalized(model,
      index, v, col("v_id") < 10, 3,
      graft.Queries.annIvfPqHierProbeSupers,
      graft.Queries.annIvfPqHierNprobe, 10)
    time("plan-analyze") { df3.queryExecution.optimizedPlan }
    time("plan-physical") { df3.queryExecution.executedPlan }
    time("plan-execute") {
      df3.write.mode("overwrite").format("noop").save()
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
