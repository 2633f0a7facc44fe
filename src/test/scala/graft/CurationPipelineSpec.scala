package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the composed curation pipeline (the hash
  * oracle checks exact values; this spec checks stage semantics that
  * must hold on ANY corpus). */
class CurationPipelineSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, dir)
  lazy val out = Queries.curationPipeline(spark, dir).cache()

  test("survivors are a subset of the corpus with no src0 docs") {
    val srcOf = docs.select(col("doc_id").cast("long").as("doc"),
      col("source"))
    val joined = out.join(srcOf, "doc")
    assert(joined.count() == out.count(), "survivor not in corpus")
    assert(joined.filter(col("source") === "src0").count() == 0)
  }

  test("exact-dedup keeps only the min doc_id of each duplicate group") {
    val dupLosers = docs
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .filter(col("_rn") > 1)
      .select(col("doc_id").cast("long").as("doc"))
    assert(out.join(dupLosers, "doc").count() == 0)
  }

  test("every survivor clears the quality gate and has a scrub hash") {
    assert(out.filter(col("quality") < 0.6).count() == 0)
    assert(out.filter(col("scrub_hash").isNull ||
      length(col("scrub_hash")) =!= 32).count() == 0)
    assert(out.count() > 0)
  }

  test("quality is scored on the SCRUBBED text (stage order)") {
    // scrub then score must equal score-of-scrubbed computed directly
    val scrubbed = operators.TextOps.piiScrub(
      docs.select(col("doc_id").cast("long").as("doc"), col("text")),
      "doc", "text").select(col("doc"), col("scrubbed"))
    val direct = operators.TextOps.qualityScore(scrubbed, "doc", "scrubbed")
      .select(col("doc"), round(col("quality"), 6).as("q"))
    val mismatch = out.join(direct, "doc")
      .filter(abs(col("quality") - col("q")) > 1e-12)
    assert(mismatch.count() == 0)
  }

  test("sampling is deterministic: a second run returns identical rows") {
    val again = Queries.curationPipeline(spark, dir)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
  }
}
