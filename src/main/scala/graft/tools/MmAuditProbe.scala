package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage attribution for mm_image_recall_audit — the r11
  * verdict's named decomposition ("render + truth + search with a
  * named owner for any drift"). Phases:
  *
  *  1. render — drain the planted-PNG corpus (the bench fixture entry)
  *  2. hash   — one aHash pass over the corpus (render + decode +
  *              8×8 grid hash; `hash − render` ≈ decode+hash cost)
  *  3. truth  — the UNCAPPED pigeonhole band join over the cached
  *              hashes (the audit's ground-truth side)
  *  4. search — the CAPPED band join (the shipped near-dup chain)
  *  5. full   — the whole audit query
  *
  * Run: `runMain graft.tools.MmAuditProbe [sfDir]`. */
object MmAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.MultimodalOps
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm pass absorbs JIT/codegen
    drain(graft.Queries.mmImageRecallAudit(spark, "/root/testdata/sf0.001"))

    val media = graft.Queries.mmRecallAuditMedia(spark, dir)
    time("render") { drain(media) }
    val hashes = time("hash") {
      val h = graft.CacheRegistry.persistTracked(
        MultimodalOps.imageAHash(media))
      h.count(); h
    }
    time("truth") {
      drain(MultimodalOps.imagePairsFromHashes(hashes, 8, 8, 7, None))
    }
    time("search") {
      drain(MultimodalOps.imagePairsFromHashes(hashes, 8, 8, 7,
        Some(graft.Queries.imageNearDupBucketCap)))
    }
    time("full") {
      drain(graft.Queries.mmImageRecallAudit(spark, dir))
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
