package graft.tools

import graft.Tables
import graft.operators.{LshIndexIO, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B for the incremental-dedup economics on REAL documents (the
  * IncDedup100x standing proves exactness on its planted corpus, but its
  * 4-token docs make the band table ~6× the text bytes, inverting the
  * IO economics the probe exists for). This measures, on the driver's
  * documents table (or a make_bench_sf replica of it):
  *
  *  - `full_sec`: from-scratch [[TextOps.minhashLshPairs]] over old∪new
  *    (re-shingles EVERYTHING — what a naive snapshot N+1 pays);
  *  - `probe_sec`: [[LshIndexIO.probe]] of the new batch against the
  *    prebuilt index (shingles the BATCH only, reads the band table);
  *  - `build_sec`: the index build, paid once at snapshot N.
  *
  * Split: source src15-src19 = the new batch (the dedup_incremental
  * oracle's split) — or, with a second `newMinId` arg, `doc_id >=
  * newMinId` (the snapshot shape: a replicated corpus's last replicas
  * as the arriving batch, e.g. 480000 on a 100×-replica table for a
  * 24:1 old:new ratio). Prints one JSON line for docs/SCALE.md.
  *
  * Usage: runMain graft.tools.IncProbeBench [sfDir] [newMinId]
  *
  * Reproducing the SCALE.md 500k-real-doc measurement: replicate the
  * sf0.1 documents table 100× with per-replica id offsets and text
  * suffixes (the make_bench_sf discipline), then split the last 4
  * replicas off as the arriving batch —
  * {{{
  * python3 - <<'PY'
  * import duckdb, os
  * os.makedirs('/tmp/docs100x', exist_ok=True)
  * con = duckdb.connect()
  * con.execute("CREATE VIEW ks AS SELECT unnest(range(0,100)) AS k")
  * q = ("SELECT doc_id + k*5000 AS doc_id, source, "
  *      "text || ' r' || k::VARCHAR AS text FROM "
  *      "read_parquet('/root/testdata/sf0.1/documents.parquet') "
  *      "CROSS JOIN ks")
  * con.execute("COPY (" + q + ") TO '/tmp/docs100x/documents.parquet'"
  *             " (FORMAT PARQUET)")
  * PY
  * sbt "runMain graft.tools.IncProbeBench /tmp/docs100x 480000"
  * }}}
  */
object IncProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val newMinId = args.drop(1).headOption.map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val isNew = newMinId match {
      case Some(m) => col("doc_id") >= m
      case None => substring(col("source"), 4, 10).cast("int") >= 15
    }
    val oldDocs = docs.filter(!isNew)
    val newDocs = docs.filter(isNew)
    val (nOld, nNew) = (oldDocs.count(), newDocs.count())

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the scan cache once so all three measurements see warm IO
    docs.count()

    val idxDir = java.nio.file.Files.createTempDirectory("incprobe").toString
    val (nBands, buildSec) = timed(
      LshIndexIO.build(oldDocs, "doc_id", "text", idxDir))
    val (nProbe, probeSec) = timed {
      val r = LshIndexIO.probe(spark, idxDir, newDocs, "doc_id", "text").count()
      graft.CacheRegistry.releaseAll(); r
    }
    val (nFull, fullSec) = timed {
      val r = TextOps.minhashLshPairs(docs, "doc_id", "text").count()
      graft.CacheRegistry.releaseAll(); r
    }
    println(s"""{"tool":"inc_probe_bench","dir":"$dir","n_old":$nOld,""" +
      s""""n_new":$nNew,"index_band_rows":$nBands,"build_sec":$buildSec,""" +
      s""""probe_pairs":$nProbe,"probe_sec":$probeSec,""" +
      s""""full_pairs":$nFull,"full_sec":$fullSec}""")
    spark.stop()
  }
}
