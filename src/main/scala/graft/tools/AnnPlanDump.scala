package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the physical plan of the served ANN search against a
  * built index — checks whether the probed-cell join prunes the
  * cell-partitioned index scan (dynamic partition pruning) or scans
  * every cell. Run: `runMain graft.tools.AnnPlanDump <sfDir>`. */
object AnnPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("ann_plan").toString
    graft.operators.AnnIndexIO.buildAuto(emb, "vec_id", "embedding", idx,
      nCells = graft.Queries.annIvfPqCells)
    val out = graft.operators.AnnIndexIO.searchAuto(spark, idx, emb,
      "vec_id", "embedding", col("v_id") < 10, k = 3, nprobe = 2)
    println("=== formatted plan ===")
    out.explain("formatted")
    println("=== run: rows = " + out.count() + " ===")
    spark.stop()
  }
}
