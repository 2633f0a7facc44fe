package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — co-located joins decided at WRITE time.
  *
  * A join between two tables bucketed (and sorted) by the join key into
  * the same bucket count plans with ZERO exchanges and zero sorts: each
  * task reads bucket i of both sides and merges. At 100 TB this is the
  * difference between re-shuffling the fact table on every consuming
  * query and shuffling it exactly once at layout time — the batch
  * analogue of co-partitioned stream-stream joins, and the standing
  * answer SCALE.md's partitioning model gives for "the same big join
  * runs nightly".
  *
  * Buckets are Spark catalog tables (`saveAsTable` — bucket metadata
  * lives in the metastore; plain `parquet(path)` cannot carry it).
  * Bucket count is the write-time parallelism knob: pick so one bucket
  * of the FACT side fits an executor's memory comfortably
  * (SCALE.md: ~128-512 MB per bucket at the target SF).
  */
object BucketedLayout {

  /** Persist `df` bucketed+sorted by `key` into `buckets` buckets as
    * catalog table `name` (overwrite).
    *
    * Also clears an orphaned LOCAL warehouse location left by a crashed
    * previous write (saveAsTable refuses to reuse one). The cleanup is
    * deliberately scoped to local-filesystem warehouses and unqualified
    * default-database names — the local-mode crash case; on a shared
    * metastore with an HDFS/S3 warehouse an orphaned location is an
    * operational condition to resolve deliberately, not something a
    * library write should delete. */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // Resolve the table's REAL managed location through the catalog
    // (honours the session's current database) — concatenating
    // warehouse + name would point at default.<name> even when the
    // current database is something else, deleting live data.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val location = spark.sessionState.catalog.defaultTablePath(ident)
    if (location.getScheme == null || location.getScheme == "file") {
      val orphan = new java.io.File(location.getPath)
      if (orphan.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(orphan)
      }
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Join two same-bucketed tables on `key`. With
    * `spark.sql.sources.bucketing.enabled` (default true) and matching
    * bucket counts this is exchange-free (spec-asserted). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    table(spark, left).join(table(spark, right), key)
}
