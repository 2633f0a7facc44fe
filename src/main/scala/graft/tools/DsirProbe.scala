package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split sample_dsir / bpe_train cost into phases.
  * Run: `runMain graft.tools.DsirProbe <sfDir>`. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    // raw phases
    import graft.operators.TextOps
    val toks = TextOps.tokens(col("text"))
    val n = greatest(size(toks) - 1, lit(0))
    val feats0 = docs.select(col("doc_id").as("doc"),
        (TextOps.qualityCol(col("text")) >= 0.8).as("_is_t"),
        explode(zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
      .withColumn("_b", pmod(TextOps.hash60(concat_ws(" ",
        col("_bg.w1"), col("_bg.w2"))), lit(1024)))
      .select(col("doc"), col("_is_t"), col("_b"))
    time("explode-count") { println("  rows=" + feats0.count()) }
    time("explode-count-2") { feats0.count() }
    val cached = graft.CacheRegistry.persistTracked(feats0)
    time("persist-count") { cached.count() }
    time("agg-raw") { cached.groupBy("_b").agg(count(lit(1))).count() }
    time("agg-tot") { cached.agg(count(lit(1)),
      count(when(col("_is_t"), 1))).collect() }
    graft.CacheRegistry.releaseAll()
    // dsir: construction (train + collect) vs drain (serve)
    val df = time("dsir-construct") {
      graft.operators.TextOps.dsirWeights(docs, "doc_id", "text",
        graft.operators.TextOps.qualityCol(col("text")) >= 0.8)
    }
    time("dsir-serve-drain") {
      df.write.mode("overwrite").format("noop").save()
    }
    time("dsir-serve-again") {
      df.write.mode("overwrite").format("noop").save()
    }
    graft.CacheRegistry.releaseAll()
    // novelty phases
    val sh = graft.operators.TextOps.shingled(docs, "doc_id", "text", 3)
      .select(col("doc"), explode(col("sh")).as("g"))
    time("novelty-explode") { sh.count() }
    time("novelty-owner") { sh.groupBy("g").agg(min(col("doc"))).count() }
    time("novelty-full") {
      graft.operators.TextOps.ngramNovelty(docs, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
    }
    graft.CacheRegistry.releaseAll()
    // bpe_train: all cost is construction
    time("bpe-train-construct") {
      graft.operators.TextOps.bpeTrain(docs, "doc_id", "text")
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
