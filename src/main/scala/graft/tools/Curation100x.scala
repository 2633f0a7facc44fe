package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-SCALE standing for the TUNED curation capstone
  * (`curation_pipeline_tuned` — the r15 watch item): plants a
  * `documents` corpus two-plus orders larger than sf0.1 (default 10⁶
  * docs vs 5·10³) with CLOSED-FORM stage truth, writes it as a real
  * parquet `documents` table, and runs the EXACT shipped query
  * ([[graft.Queries.curationPipelineTuned]]) end to end — logreg fit,
  * held-out audit, threshold gate, and the five-stage curation chain.
  *
  * Planted strata by `doc_id % 10` (all texts language-ID'd `de`, whose
  * stratified-sampling rate is the 1.0 default — so the sampling stage
  * is the identity and the survivor SET is exact, not statistical):
  *  - 0, 1: an exact-duplicate pair (identical text) → dedup keeps the
  *    even id;
  *  - 2: shares a 7-token run (= five 3-gram shingles, exactly the
  *    `minOverlap = 5` gate) with the `src0` benchmark docs →
  *    decontaminated away;
  *  - 3: three words, no quality stopword → composite quality 0.2 →
  *    dropped at the 0.6 gate;
  *  - 4..9: unique, quality 1.0 (one English stopword clears the
  *    stop-ratio floor; `de` markers outnumber it), kept.
  * Expected chain survivors: exactly the ids ≡ 0, 4..9 (mod 10). The
  * planted quality split is linearly separable, so the audit's best-F1
  * threshold must gate out NO chain survivor — the tool asserts the
  * tuned output EQUALS the closed-form survivor set (zero missing,
  * zero extra).
  *
  * Plan evidence, not claims: zero cartesian/broadcast-nested-loop
  * joins; keyless windows ≤ 1 and only the audit's score-domain
  * cumulative window (input ≤ 10⁶+1 rows by the round-6 score
  * quantization — the documented PlanAuditSpec exemption); the
  * single-partition exchange count is REPORTED (the audit's 1-row
  * aggregates legitimately collapse; the corpus axis must not).
  *
  * Usage: runMain graft.tools.Curation100x [nDocs]
  */
object Curation100x {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ----- planted corpus (written as a REAL documents.parquet so the
    // shipped query runs unmodified against it)
    val id = col("id")
    val strat = id % 10
    val dupBase = id - (id % 10) // ids 10k and 10k+1 share text
    def normalText(base: org.apache.spark.sql.Column) = concat_ws(" ",
      lit("the"), lit("der"), lit("die"), lit("und"),
      concat(lit("w"), base), concat(lit("v"), base + 1),
      concat(lit("x"), base % 97), concat(lit("y"), base % 89),
      concat(lit("z"), base % 83), concat(lit("q"), base % 79))
    val benchRun = "bench0 bench1 bench2 bench3 bench4 bench5 bench6"
    val text = when(strat <= 1, normalText(dupBase))
      .when(strat === 2, concat(lit("the der die und " + benchRun + " c"), id))
      .when(strat === 3, concat(lit("und kk"), id))
      .otherwise(normalText(id * 10 + 7)) // disjoint from the dup bases
    val main = spark.range(nDocs).select(
      id.as("doc_id"), text.as("text"), lit("de").as("lang"),
      concat(lit("src"), id % 3 + 1).as("source"),
      length(text).as("n_chars"))
    val bench = spark.range(64).select(
      (id + nDocs).as("doc_id"),
      concat(lit(benchRun + " extra"), id).as("text"),
      lit("en").as("lang"), lit("src0").as("source"),
      lit(64L).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("curation100x").toString
    main.unionByName(bench)
      .repartitionByRange(32, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // ----- the shipped query, unmodified
    val t0 = System.nanoTime()
    val tuned = graft.Queries.curationPipelineTuned(spark, dir)

    val p = tuned.queryExecution.executedPlan.toString
    val singleExchanges =
      p.split("\n").count(_.contains("Exchange SinglePartition"))
    val allPairs = (if (p.contains("CartesianProduct")) 1 else 0) +
      (if (p.contains("BroadcastNestedLoopJoin")) 1 else 0)
    val keyless = tuned.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }.length

    val got = tuned.select(col("doc")).persist()
    val nGot = got.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // closed-form survivor set: ids ≡ 0, 4..9 (mod 10)
    val expected = spark.range(nDocs).select(id.as("doc"))
      .filter(id % 10 === 0 || id % 10 >= 4)
    val missing = expected.join(got, Seq("doc"), "left_anti").count()
    val extra = got.join(expected, Seq("doc"), "left_anti").count()
    graft.CacheRegistry.releaseAll()
    got.unpersist()

    println(s"""{"tool":"curation_100x","n_docs":$nDocs,""" +
      s""""survivors":$nGot,"expected":${nDocs / 10 * 7},""" +
      s""""missing":$missing,"extra":$extra,""" +
      s""""single_partition_exchanges":$singleExchanges,""" +
      s""""keyless_windows":$keyless,"all_pairs_joins":$allPairs,""" +
      f""""sec":$sec%.1f,"docs_per_sec":${nDocs / sec}%.0f}""")
    require(missing == 0 && extra == 0,
      s"planted-oracle mismatch: $missing missing, $extra extra " +
        "(the audit threshold gated a planted survivor, or a stage drifted)")
    require(allPairs == 0, "capstone plan grew an all-pairs join")
    require(keyless <= 1,
      s"$keyless keyless windows — only the audit's bounded score-domain " +
        "cumulative window is exempt")
    println("[curation_100x] PLANTED ORACLE GREEN (tuned capstone at " +
      s"$nDocs docs)")
    spark.stop()
  }
}
