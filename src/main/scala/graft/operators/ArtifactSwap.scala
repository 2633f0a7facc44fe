package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation swap for persisted index artifacts — the promotion step of
  * every maintenance operator ([[LshIndexIO.compact]]/
  * [[LshIndexIO.reshingle]], [[AnnIndexIO.retrain]]).
  *
  * Maintenance rebuilds an artifact NEXT TO the live one and promotes it
  * with directory renames, so a reader never observes a half-written
  * index: the new generation is fully materialized (and fsync'd by the
  * parquet committer) before the live path changes at all. The reference
  * applies the same materialize-then-promote discipline to its memoized
  * pipeline artifacts (pipelines.py:84-92: outputs land under the final
  * name only after the producing step completes).
  *
  * Atomicity contract, stated honestly: promotion is TWO renames
  * (live → `_prev`, next → live) plus a cleanup delete. On HDFS and
  * POSIX filesystems each rename is atomic, so the only crash window
  * leaves the live name ABSENT with both generations intact under
  * `_prev`/the next path — recoverable, never corrupt, and [[swap]]
  * rolls the previous generation back if the promote rename itself
  * fails. Readers that already listed the old generation's files finish
  * their scan against the `_prev` inodes (POSIX) — new queries list the
  * new generation. Object stores without atomic rename (S3) should wrap
  * the artifact root in a manifest-pointer layout instead; the swap is
  * kept directory-shaped so that wrapper is a deployment concern, not an
  * operator rewrite.
  */
private[operators] object ArtifactSwap {

  /** Replace the `live` artifact (dir or file) with `next`. `live` may
    * not exist yet (first generation); `next` must. */
  def swap(spark: SparkSession, live: String, next: String): Unit = {
    val livePath = new Path(live)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = new Path(live + "_prev")
    if (fs.exists(prev)) fs.delete(prev, true)
    if (fs.exists(livePath) && !fs.rename(livePath, prev))
      throw new java.io.IOException(s"ArtifactSwap: cannot retire $live")
    if (!fs.rename(new Path(next), livePath)) {
      if (fs.exists(prev)) fs.rename(prev, livePath) // roll back, never lose live
      throw new java.io.IOException(s"ArtifactSwap: cannot promote $next")
    }
    fs.delete(prev, true)
  }

  /** Remove a stale `next`-generation path left by a crashed prior
    * maintenance attempt, so rebuilds start clean. */
  def clearStale(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The shared compaction core (both index families' `compact` is this
    * with a family-specific range placement): read the live table,
    * rewrite it through `place` (range-repartition + within-partition
    * sort at `parts` writer arity), land it partitioned on
    * `partitionCol` next to the live dir, promote by [[swap]]. Pass
    * `knownBefore` when the caller already listed the tree (the
    * fragmentation gates do) so the listing isn't paid twice — on
    * object stores the listing RPCs are exactly what compaction exists
    * to bound. Returns (files_before, files_after). */
  def compactTable(spark: SparkSession, live: String,
                   place: (DataFrame, Int) => DataFrame,
                   partitionCol: String, targetPartitions: Int,
                   knownBefore: Long = -1L): (Long, Long) = {
    val parts = if (targetPartitions > 0) targetPartitions
                else spark.sparkContext.defaultParallelism
    val before = if (knownBefore >= 0) knownBefore
                 else dataFileCount(spark, live)
    val next = live + "_next"
    clearStale(spark, next)
    place(spark.read.parquet(live), parts)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(next)
    swap(spark, live, next)
    (before, dataFileCount(spark, live))
  }

  /** The shared fragmentation gate: ONE recursive listing, compared to
    * `maxFiles` (default 8× cluster parallelism — above any single
    * build's writer arity). Returns Some(count) when over the cap —
    * the caller feeds it to [[compactTable]] as `knownBefore`. */
  def fragmentedAt(spark: SparkSession, live: String,
                   maxFiles: Int): Option[Long] = {
    val cap = if (maxFiles > 0) maxFiles
              else 8 * spark.sparkContext.defaultParallelism
    val n = dataFileCount(spark, live)
    if (n > cap) Some(n) else None
  }

  /** Recursive data-file count under a path (parquet part files only —
    * success markers and checksums excluded): the compaction monitor's
    * before/after evidence. */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }
}
