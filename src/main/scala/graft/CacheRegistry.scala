package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Operator-scoped cache lifecycle.
  *
  * Several operators persist small intermediates that BOTH sides of a
  * self-join (LSH band tables) or two consumers (count gate + semi-join)
  * read — without the persist the whole upstream lineage executes twice.
  * But a bare `persist` never releases: a long-lived session running many
  * queries accumulates cached RDDs until executors spill or OOM (SCALE.md
  * pitfall 4). Operators therefore route persists through this registry,
  * and the session releases them once the consuming query has
  * materialized:
  *
  *   val result = Queries.dedupMinhashLsh(spark, dir)
  *   result.write.parquet(out)        // caches used here
  *   CacheRegistry.releaseAll()       // storage back to zero
  *
  * `releaseAll` is what Verify/Bench call between queries; unpersist is
  * safe even if a plan still references the DataFrame — Spark falls back
  * to recomputing the lineage — so a stray early release costs time, not
  * correctness.
  */
object CacheRegistry {

  private val handles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and track the handle for later [[releaseAll]]. */
  def persistTracked(df: DataFrame,
                     level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    handles.add(p)
    p
  }

  /** Unpersist every tracked handle (blocking, so the spec's storage
    * assertion is race-free). Idempotent. */
  def releaseAll(): Unit = {
    var df = handles.poll()
    while (df != null) {
      df.unpersist(blocking = true)
      df = handles.poll()
    }
  }

  /** Number of currently tracked (not yet released) handles. */
  def trackedCount: Int = handles.size()
}
