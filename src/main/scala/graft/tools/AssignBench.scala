package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Dev-only micro-benchmark: the coarse-assignment kernel at the
  * 10⁴-cell regime — FLAT (`cellRanks`, O(nCells·dim) per row) vs
  * TWO-LEVEL (`assignHierCells`, O((k1+k2)·dim) per row) over the same
  * corpus and the same 10⁴ effective cells. Centroids are fabricated
  * from the id-ordered sample (no Lloyd — this isolates the per-row
  * ASSIGNMENT cost, which is what scales with the corpus; the fit is a
  * one-off over the bounded sample). Numbers recorded in docs/SCALE.md.
  *
  * Usage: runMain graft.tools.AssignBench <sfDir> [nCells]
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 10000
    val k = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val v = VectorOps.normalized(
        graft.Tables.embeddings(spark, dir), "vec_id", "embedding")
      .select(col("vec_id").as("v_id"), col("vn")).persist()
    val nRows = v.count()
    val sample = v.orderBy("v_id").limit(k * k).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("vn").toArray)
    // fabricated quantizers over the SAME cell count: flat = first k·k
    // sample vectors; hier = k supers × k children from the same pool
    // (cycled if the sample is smaller than k·k)
    def centAt(i: Int) = sample(i % sample.length)
    val flatCents = Array.tabulate(math.min(nCells, sample.length))(centAt)
    val hier = VectorOps.HierKmeansModel(
      Array.tabulate(k)(s => centAt(s * k)),
      Array.tabulate(k)(s => Array.tabulate(k)(c => centAt(s * k + c))))

    def drain(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both codegen paths once
    drain(v.limit(64).withColumn("cid",
      VectorOps.cellRanks(col("vn"), flatCents.take(16))
        .getItem(0).getField("cid")))
    drain(VectorOps.assignHierCells(v.limit(64), "vn", hier).select("cid"))

    val tFlat = drain(v.withColumn("cid",
      VectorOps.cellRanks(col("vn"), flatCents)
        .getItem(0).getField("cid")).select("v_id", "cid"))
    val tHier = drain(
      VectorOps.assignHierCells(v, "vn", hier).select("v_id", "cid"))
    println(f"""{"metric":"assign_cost","rows":$nRows,"cells":${flatCents.length},"flat_sec":$tFlat%.3f,"hier_sec":$tHier%.3f,"ratio":${tFlat / tHier}%.1f}""")
    spark.stop()
  }
}
