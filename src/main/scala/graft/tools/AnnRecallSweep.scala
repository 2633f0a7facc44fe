package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CacheRegistry, Tables}
import graft.operators.{AnnIndexIO, VectorOps}

/** Recall-vs-cost sweep for the quantized ANN tiers (r12 verdict #1):
  * for each tier (flat PQ, IVF-PQ, two-level IVF-PQ, learned-OPQ×IVF on
  * the REAL embedding table) sweep the serving levers the code exposes —
  * `nprobe`/`probeSupers` and the exact-rerank depth — and report
  * measured recall@3 against the exact brute-force truth plus wall
  * seconds per search. The output table feeds docs/SCALE.md and the
  * choice of shipped defaults (recall@3 ≥ 0.9 on the real corpus).
  *
  * Dev tool: timing is min-of-2 warm runs per config (indexes prebuilt
  * once per tier, outside the timed region — the serving regime).
  *
  * Usage: AnnRecallSweep <sfDir> [tierFilter]
  */
object AnnRecallSweep {
  private val K = 3

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tierFilter: Option[String] = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files
      .createTempDirectory("graft_ann_sweep").toString
    val emb = Tables.embeddings(spark, sfDir)

    // exact truth, collected once (10 queries × k rows)
    val truth: Set[(Long, Long)] = VectorOps
      .bruteTopK(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", K)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheRegistry.releaseAll()
    val nTruth = truth.size.toDouble

    case class Res(tier: String, cfg: String, recall: Double, sec: Double)
    val out = scala.collection.mutable.ArrayBuffer[Res]()

    def run(tier: String, cfg: String)(mk: => DataFrame): Unit = {
      if (tierFilter.exists(f => !tier.startsWith(f))) return
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = mk.select(col("q_id"), col("n_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        CacheRegistry.releaseAll()
        (got.count(truth.contains).toDouble / nTruth, sec)
      }
      val (r1, s1) = once(); val (r2, s2) = once()
      require(r1 == r2, s"$tier $cfg nondeterministic recall: $r1 vs $r2")
      val res = Res(tier, cfg, r1, math.min(s1, s2))
      out += res
      println(f"""{"tier":"$tier","cfg":"$cfg","recall":${r1}%.4f,"sec":${res.sec}%.3f}""")
    }

    // ---- flat PQ: levers are rerank (ADC depth) and codebook width
    // (ADC resolution — 16 vs 64 centroids/subspace; 64 is still
    // oracle-replayable, the Lloyd CTE chain is parameterized)
    for (r <- Seq(10, 25, 50, 100, 200, 400))
      run("pq", s"k=16,rerank=$r") {
        VectorOps.pqTopK(emb, "vec_id", "embedding", col("v_id") < 10,
          k = K, rerank = r)
      }
    for (r <- Seq(25, 50, 100, 200, 400))
      run("pq_k64", s"k=64,rerank=$r") {
        VectorOps.pqTopK(emb, "vec_id", "embedding", col("v_id") < 10,
          k = K, codebookK = 64, rerank = r)
      }

    // ---- IVF-PQ (flat 256-cell coarse): nprobe × rerank
    val ivfPath = s"$base/ivfpq"
    AnnIndexIO.buildAuto(emb, "vec_id", "embedding", ivfPath, nCells = 256)
    for ((np, r) <- Seq((16, 10), (16, 50), (16, 100), (32, 50), (32, 100),
                        (48, 100), (64, 100), (64, 200)))
      run("ivf_pq", s"nprobe=$np,rerank=$r") {
        AnnIndexIO.searchAuto(spark, ivfPath, emb, "vec_id", "embedding",
          col("v_id") < 10, k = K, nprobe = np, rerank = r)
      }

    // ---- two-level IVF-PQ (100×100): probeSupers × nprobe × rerank
    val hierPath = s"$base/hier"
    AnnIndexIO.buildAuto(emb, "vec_id", "embedding", hierPath, nCells = 10000)
    for ((ps, np, r) <- Seq((4, 16, 10), (4, 16, 50), (4, 16, 100),
                            (8, 32, 50), (8, 32, 100), (8, 64, 100),
                            (12, 64, 100), (16, 96, 100), (16, 96, 200)))
      run("ivf_pq_hier", s"probeSupers=$ps,nprobe=$np,rerank=$r") {
        AnnIndexIO.searchAuto(spark, hierPath, emb, "vec_id", "embedding",
          col("v_id") < 10, k = K, nprobe = np, rerank = r,
          probeSupers = ps)
      }

    // ---- learned-OPQ×IVF on the REAL corpus (r12 verdict #4): the
    // rotation fit is an alternating Procrustes SVD — not SQL-replayable,
    // so this measured number (not a DuckDB hash) is its attestation.
    val opqPath = s"$base/opqivf"
    AnnIndexIO.buildOpqIvf(emb, "vec_id", "embedding", opqPath, nCells = 256)
    CacheRegistry.releaseAll()
    for ((np, r) <- Seq((16, 10), (16, 50), (16, 100), (32, 100),
                        (48, 100), (64, 200)))
      run("opq_ivf_real", s"nprobe=$np,rerank=$r") {
        AnnIndexIO.searchOpqIvf(spark, opqPath, emb, "vec_id", "embedding",
          col("v_id") < 10, k = K, nprobe = np, rerank = r)
      }

    println("\n| tier | config | recall@3 | sec |")
    println("|---|---|---|---|")
    out.foreach(r => println(f"| ${r.tier} | ${r.cfg} | ${r.recall}%.3f | ${r.sec}%.2f |"))
    spark.stop()
  }
}
