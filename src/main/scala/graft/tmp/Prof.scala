package graft.tmp

import org.apache.spark.sql.SparkSession

/** Temporary profiling harness (not shipped; removed after use). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization
      val t2 = System.nanoTime()
      drain(df)
      val t3 = System.nanoTime()
      graft.CacheRegistry.releaseAll()
      println(f"[prof] $n rep$rep build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
