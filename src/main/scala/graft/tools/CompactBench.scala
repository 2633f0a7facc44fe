package graft.tools

import graft.Tables
import graft.operators.LshIndexIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B for the COMPACTION economics ([[LshIndexIO.compact]]) on real
  * documents — the measured number behind "a months-long append chain
  * keeps probe cost flat": assembles the snapshot index through MANY
  * small appends (the fragmentation a daily-admission chain actually
  * produces: every batch adds files under every band partition), probes
  * the arriving batch against the fragmented index, compacts, probes
  * again, and asserts the two probes return the identical pair set.
  *
  *  - `probe_frag_sec` — probe against the append-chain index
  *    (`files_before` parquet files);
  *  - `compact_sec` — the maintenance rewrite (paid once, amortized);
  *  - `probe_compact_sec` — the same probe after compaction
  *    (`files_after` files, bounded by writer arity).
  *
  * Split mirrors the dedup_incremental oracle: src0-9 built, src10-14
  * appended in `nBatches` id-sliced batches, src15-19 probed. On the
  * 100×-replica corpus (IncProbeBench's recipe) the fragmented chain
  * carries thousands of files and the listing/footer overhead dominates
  * the probe's index-side scan.
  *
  * Usage: runMain graft.tools.CompactBench [sfDir] [nBatches]
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val gen = substring(col("source"), 4, 10).cast("int")
    val base = docs.filter(gen < 10)
    val admitted = docs.filter(gen >= 10 && gen < 15)
    val batch = docs.filter(gen >= 15)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    docs.count() // warm scan cache

    val idxDir = java.nio.file.Files.createTempDirectory("cptbench").toString
    val (_, buildSec) = timed(LshIndexIO.build(base, "doc_id", "text", idxDir))
    val (_, appendSec) = timed {
      (0 until nBatches).foreach { b =>
        LshIndexIO.append(admitted.filter(col("doc_id") % nBatches === b),
          "doc_id", "text", idxDir)
      }
    }
    def probe(): Set[String] = {
      val r = LshIndexIO.probe(spark, idxDir, batch, "doc_id", "text")
        .collect().map(_.toString).toSet
      graft.CacheRegistry.releaseAll(); r
    }
    probe() // warm the probe path once (JIT/codegen), both runs measured warm
    val (p1, probeFragSec) = timed(probe())
    val ((filesBefore, filesAfter), compactSec) =
      timed(LshIndexIO.compact(spark, idxDir))
    val (p2, probeCompactSec) = timed(probe())
    require(p1 == p2 && p1.nonEmpty,
      s"compaction changed the probe result: ${p1.size} vs ${p2.size} pairs")
    println(s"""{"tool":"compact_bench","dir":"$dir","n_batches":$nBatches,""" +
      s""""build_sec":$buildSec,"append_chain_sec":$appendSec,""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""probe_pairs":${p1.size},"probe_frag_sec":$probeFragSec,""" +
      s""""compact_sec":$compactSec,"probe_compact_sec":$probeCompactSec}""")
    println("[compact_bench] probe-after-compact == probe-before, pair-for-pair")
    spark.stop()
  }
}
