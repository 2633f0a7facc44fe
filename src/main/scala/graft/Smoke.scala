package graft

import org.apache.spark.sql.SparkSession

/** Flagship smoke — mirrors the driver's `SparkEntry.entry(spark)` check
  * (rows > 0) in a DEFAULT session, proving `entry` self-configures
  * (nanosAsLong etc.) without Verify/Bench session conf. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "flagship returned no rows")
    spark.stop()
  }
}
