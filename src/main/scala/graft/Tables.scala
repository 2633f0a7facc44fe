package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated benchmark tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory.
  * At cluster scale these would be partitioned directories; the loaders
  * take any path Spark can read, so nothing here assumes single-file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` column is a compatibility surface — the driver
    * has shipped it as three parquet shapes so far, and all must read to the
    * same session-UTC `TimestampType` so `cast(ts as double)` equals DuckDB
    * `epoch(ts)` bit-exactly:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it by default; read ns as long
    *    (`nanosAsLong`) and truncate to µs with integer division, matching
    *    DuckDB's ns→µs truncation.
    *  - naive timestamp[us]: Spark 4 reads it as TIMESTAMP_NTZ, on which
    *    `cast(as double)` is illegal; cast NTZ→TimestampType first. Under the
    *    engine's pinned UTC session timezone this is a bitwise reinterpret.
    *  - TIMESTAMP(MICROS) with tz: reads as TimestampType directly.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** Normalize any historical `ts` shape to session-UTC TimestampType. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame     = loadEvents(spark, sfDir)
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
