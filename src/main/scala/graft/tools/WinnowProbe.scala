package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: is the winnow selection plan re-computing the gram array
  * per element_at (CollapseProject inlining, docs/SCALE.md pitfall 1)?
  * Prints md5-occurrence count in the optimized plan + wall time. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val fp = graft.operators.TextOps.winnowedFingerprints(docs, "doc_id", "text")
    val plan = fp.queryExecution.optimizedPlan.toString
    println(s"[probe] md5 occurrences in optimized plan: " +
      "md5".r.findAllIn(plan).length)
    println(s"[probe] plan size chars: ${plan.length}")
    plan.split("\n").foreach(l => println("[plan] " + l.take(400)))
    val t0 = System.nanoTime()
    val n = fp.count()
    println(f"[probe] winnowedFingerprints count=$n in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
