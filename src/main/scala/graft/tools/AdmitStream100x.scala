package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.DedupAdmitStream

/** 100× standing for the streaming dedup admission
  * ([[DedupAdmitStream]]): a planted corpus of `n` documents (default
  * 200k — 400× the sf0.01 query's axis) driven through the 4-epoch
  * admission loop (admit → snapshot seen → next epoch), then checked
  * ROW-FOR-ROW against the batch twin — the whole corpus admitted as
  * ONE batch with empty initial state. The non-recursive first-owner
  * semantics promise batch-boundary INDEPENDENCE; this measures it at
  * scale instead of claiming it (0 differing rows required).
  *
  * Planted structure: 30 unique tokens per document family
  * (`w{base}_{j}` — vocabularies disjoint across families, so cross-
  * family band collisions are structurally absent); every 10th doc is
  * an EXACT copy of its family head, so exactly n/10 rejections are
  * expected and every one of them must be a planted copy (closed-form
  * replay, no engine-vs-engine circularity for the planted subset).
  *
  * Plan laws asserted in-tool on the per-epoch admission (AQE off for
  * a walkable static tree): no single-partition exchange, and NO
  * sort-merge join whose subtree scans the seen-band table — the seen
  * set must enter the sliver verify as a SCAN feeding a broadcast
  * semi-join (the [[DedupAdmitStream.admitBatch]] orientation), never
  * as a shuffled join side; at 100 TB re-shuffling the seen set every
  * batch IS the scale bug this tool exists to catch. Batch-local
  * sort-merge joins (doc-keyed conjunction) are partition-scaling and
  * allowed.
  *
  * Usage: runMain graft.tools.AdmitStream100x [nDocs]
  */
object AdmitStream100x {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE off: the plan-law check below walks the static tree
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // every 10th doc copies its family head's text exactly
    val docs = spark.range(n).select(
        col("id").as("doc"), col("id").as("ord"),
        when(col("id") % 10 === 9, col("id") - 9).otherwise(col("id"))
          .as("base"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(29)),
          j => concat(lit("w"), col("base"), lit("_"), j))))
      .drop("base")
    val root = java.nio.file.Files
      .createTempDirectory("graft_admit100x").toString
    val seenPath = root + "/seen"

    // ---- streaming loop: 4 consecutive-range epochs ----
    val t0 = System.nanoTime()
    var planChecked = false
    var singleEx = 0
    var smj = 0
    val epochSize = (n + 3) / 4
    val outPath = root + "/out"
    for (e <- 0 until 4) {
      val batch = docs
        .filter(col("doc") >= e.toLong * epochSize &&
                col("doc") < (e + 1).toLong * epochSize)
        .persist()
      val bands = DedupAdmitStream
        .bandsWithOrd(batch, "doc", "text", "ord").persist()
      val adm = DedupAdmitStream.admitBatch(spark,
        batch.select(col("doc"), col("ord")), bands, "ord", seenPath)
      if (e > 0 && !planChecked) { // the seen table exists from epoch 1 on
        val plan = adm.queryExecution.executedPlan
        singleEx = plan.toString.split("\n")
          .count(_.contains("Exchange SinglePartition"))
        // the scale law: RAW seen-table rows must never cross a shuffle
        // — they may only stream through a broadcast join (the sliver
        // semi) or be reduced by an aggregate first. Walk each shuffle's
        // child subtree, stopping at boundaries whose OUTPUT is no
        // longer raw seen rows (broadcast joins, aggregates); a seen
        // scan reached without such a boundary means the corpus-sized
        // table re-shuffles every batch. (String matching can't do
        // this: every ancestor join's subtree string contains the seen
        // path through the broadcast lineage.)
        import org.apache.spark.sql.execution.SparkPlan
        def rawSeenBelow(p: SparkPlan): Boolean = p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.toString.contains(seenPath)
          case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => false
          case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => false
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => false
          case other => other.children.exists(rawSeenBelow)
        }
        smj = plan.collect {
          case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if rawSeenBelow(ex.child) => 1
          // broadcasting the raw seen table is the SAME scale-bug class
          // (whole corpus collected to the driver every batch) — the
          // legit broadcast is of `hits`, whose child is the distinct
          // AGGREGATE (a rawSeenBelow boundary), so only a regression
          // that broadcasts the unreduced seen scan trips this
          case bx: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
            if rawSeenBelow(bx.child) => 1
        }.sum
        planChecked = true
      }
      adm.write.mode("append").parquet(outPath)
      DedupAdmitStream.snapshotSeen(spark, bands, seenPath)
      bands.unpersist(); batch.unpersist()
      ()
    }
    val streamed = spark.read.parquet(outPath)
    val sec = (System.nanoTime() - t0) / 1e9

    // ---- batch twin: whole corpus, one batch, empty state ----
    val twinSeen = root + "/twin_seen"
    val allBands = graft.CacheRegistry.persistTracked(
      DedupAdmitStream.bandsWithOrd(docs, "doc", "text", "ord"))
    val twin = DedupAdmitStream.admitBatch(spark,
      docs.select(col("doc"), col("ord")), allBands, "ord", twinSeen)

    val diff = streamed.select("doc", "admitted", "n_bands")
      .exceptAll(twin.select("doc", "admitted", "n_bands"))
      .union(twin.select("doc", "admitted", "n_bands")
        .exceptAll(streamed.select("doc", "admitted", "n_bands")))
      .count()
    val rejected = streamed.filter(!col("admitted"))
    val nRejected = rejected.count()
    val planted = rejected.filter(col("doc") % 10 === 9).count()
    graft.CacheRegistry.releaseAll()

    println(s"""{"tool":"admit_stream_100x","n_docs":$n,"epochs":4,""" +
      s""""diff_rows":$diff,"rejected":$nRejected,""" +
      s""""planted_rejected":$planted,""" +
      s""""single_partition_exchanges":$singleEx,"seen_rows_shuffled":$smj,""" +
      f""""sec":$sec%.1f,"docs_per_sec":${n / sec}%.0f}""")
    require(diff == 0,
      s"streaming admission diverged from the batch twin on $diff rows")
    require(planted == n / 10 && nRejected >= n / 10,
      s"planted exact-dup rejections wrong: $planted of ${n / 10}")
    require(singleEx == 0 && smj == 0,
      "admission plan funneled or sort-merge-joined the seen table")
    println("[admit_stream_100x] STREAM ≡ BATCH TWIN " +
      "(boundary-independent, seen table scan-only)")
    // clean the run's /tmp state — stranded standings are the disk-leak
    // class that filled the box quota in r10
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
