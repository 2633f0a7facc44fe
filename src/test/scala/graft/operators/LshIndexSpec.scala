package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Build/search split of the LSH text index (LshIndexIO): pairs computed
  * over the persisted band table must be bit-identical to the inline
  * minhashLshPairs lineage on the same corpus. */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  // small corpus with planted near-dups: docs 0/1 and 4/5 share most
  // shingles; the rest are distinct
  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and often"),
    (2L, "completely different text about spark catalyst optimizer rules"),
    (3L, "yet another unrelated document discussing parquet column pruning"),
    (4L, "minhash signatures band together into lsh buckets for dedup work"),
    (5L, "minhash signatures band together into lsh buckets for dedup runs"),
    (6L, "short doc"),
    (7L, "")).toDF("doc_id", "text")

  def pairKey(df: DataFrame): Set[(Long, Long, Long)] = df.collect()
    .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      java.lang.Double.doubleToLongBits(r.getAs[Double]("est_jaccard"))))
    .toSet

  test("pairs over a built index == inline minhashLshPairs, bit-for-bit") {
    val inline = pairKey(TextOps.minhashLshPairs(docs, "doc_id", "text"))
    graft.CacheRegistry.releaseAll()
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    val n = LshIndexIO.build(docs, "doc_id", "text", dir)
    // one row per doc×band for every doc with >= k tokens
    assert(n > 0 && n % 4 == 0, s"band table rows $n not a multiple of bands")
    // band table is band-partitioned on disk (file-listing pruning axis)
    val bandsDir = new java.io.File(s"$dir/bands")
    assert(bandsDir.listFiles().exists(_.getName.startsWith("band_id=")),
      "band table not partitioned by band_id")
    val viaIndex = pairKey(LshIndexIO.pairs(spark, dir))
    graft.CacheRegistry.releaseAll()
    assert(inline.nonEmpty && viaIndex == inline)
    // the planted near-dup pair survives the index round-trip
    assert(viaIndex.map(t => (t._1, t._2)).contains((0L, 1L)))
  }

  test("bucket cap applies identically over the loaded index") {
    val inline = pairKey(TextOps.minhashLshPairs(docs, "doc_id", "text",
      maxBandBucket = Some(2)))
    graft.CacheRegistry.releaseAll()
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_cap").toString
    LshIndexIO.build(docs, "doc_id", "text", dir)
    val viaIndex = pairKey(LshIndexIO.pairs(spark, dir,
      maxBandBucket = Some(2)))
    graft.CacheRegistry.releaseAll()
    assert(viaIndex == inline)
  }
}
