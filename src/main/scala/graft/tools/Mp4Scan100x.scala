package graft.tools

import graft.multimodal.{MultimodalOps, VisionFixtures, VisionOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× PLANTED-ORACLE standing for the mp4 video tier — the two-tier
  * claim the S1 scaladocs make, stood at listing scale:
  *
  *  - '''Structural tier''' (the 100 TB listing pass): `nMeta`
  *    (default 200,000 ≈ 400× sf0.1's media corpus) FRAGMENTED
  *    avc1/H.264 mp4 blobs — the fMP4/CMAF layout streaming captures
  *    emit, whose moov sample tables are EMPTY — scanned by
  *    [[MultimodalOps.mp4Meta]]. Truth is closed-form per blob id
  *    (codec `avc1`, 48×48, `2 + id % 3` trun-counted samples,
  *    timescale 600, duration nf×20); the law is ZERO mismatching rows
  *    and an exact row count, verified distributedly (one filter, no
  *    collect).
  *  - '''Decode tier''': `nDecode` (default 20,000) jpeg-coded
  *    fragmented blobs through the full
  *    [[VisionOps.detectPupilsVideo]] kernel — the law is the exact
  *    detection-row count Σ nf (every planted frame has exactly one
  *    ellipse; per-pixel value truth is the `cv_video_mp4_frag` oracle
  *    row's job at sf0.01, not re-litigated here).
  *
  * Plan law (both tiers): the executed plan holds ONE
  * `Exchange hashpartitioning` (the pre-render id repartition that buys
  * kernel parallelism) and a MapPartitions kernel stage — the
  * render→demux→scan lineage never re-shuffles.
  *
  * Usage: runMain graft.tools.Mp4Scan100x [nMeta] [nDecode]
  */
object Mp4Scan100x {
  def main(args: Array[String]): Unit = {
    val nMeta = args.headOption.map(_.toLong).getOrElse(200000L)
    val nDecode = args.drop(1).headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // AQE plan strings print the SAME exchange under both "== Final
    // Plan ==" and "== Initial Plan ==" once a stage is materialized —
    // count only the final section (the r15 plan-audit lesson: executed
    // exchanges = printed minus duplicated-lineage copies)
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      val cut = p.indexOf("== Initial Plan ==")
      if (cut >= 0) p.substring(0, cut) else p
    }
    def assertPlan(name: String, p: String): Unit = {
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(ex <= 1, s"$name: $ex exchanges in a row-local scan:\n$p")
      assert(p.contains("MapPartitions"), s"$name lost its kernel stage")
      assert(!p.contains("Exchange SinglePartition"),
        s"$name funnelled through a single partition")
    }

    // ---- structural tier: fragmented avc1 listing at nMeta blobs ----
    val metaIds = spark.range(nMeta).toDF("doc_id")
    val metaDf = MultimodalOps.mp4Meta(
      VisionFixtures.plantMedia(metaIds, "doc_id", "video_mp4_frag_avc"))
    val t0 = System.nanoTime()
    val listed = graft.CacheRegistry.persistTracked(metaDf)
    val nListed = listed.count()
    val metaSec = (System.nanoTime() - t0) / 1e9
    // closed-form truth, checked distributedly (zero driver rows)
    val expectedNf = lit(2) + pmod(col("media_id"), lit(3L))
    val bad = listed.filter(!(
      col("codec") === "avc1" && col("width") === 48 &&
      col("height") === 48 &&
      col("n_samples") === expectedNf.cast("long") &&
      col("timescale") === 600L &&
      col("duration") === (expectedNf * 20).cast("long"))).count()
    assert(nListed == nMeta, s"listing lost blobs: $nListed of $nMeta")
    assert(bad == 0, s"$bad blobs listed with wrong track metadata")
    assertPlan("mp4_meta", planOf(metaDf))
    graft.CacheRegistry.releaseAll()

    // ---- mixed-corpus tier: the unified listing over all four
    // containers (the real media-lake shape), nMeta/2 blobs ----
    val nMixed = nMeta / 2
    val mixedDf = MultimodalOps.videoMeta(
      VisionFixtures.plantMedia(spark.range(nMixed).toDF("doc_id"),
        "doc_id", "video_mixed"))
    val t2 = System.nanoTime()
    val mixed = graft.CacheRegistry.persistTracked(mixedDf)
    val nMixedListed = mixed.count()
    val mixedSec = (System.nanoTime() - t2) / 1e9
    val contOf = expr("CASE media_id % 4 WHEN 0 THEN 'grvd' " +
      "WHEN 1 THEN 'gpnv' WHEN 2 THEN 'avi' ELSE 'mp4' END")
    val codecOf = expr("CASE media_id % 4 WHEN 0 THEN 'raw' " +
      "WHEN 1 THEN 'png' WHEN 2 THEN 'MJPG' ELSE 'jpeg' END")
    val badMixed = mixed.filter(!(
      col("container") === contOf && col("codec") === codecOf &&
      col("width") === 48 && col("height") === 48 &&
      col("n_frames") === (lit(2) + pmod(col("media_id"), lit(3L)))
        .cast("int"))).count()
    assert(nMixedListed == nMixed,
      s"mixed listing lost blobs: $nMixedListed of $nMixed")
    assert(badMixed == 0, s"$badMixed mixed blobs listed wrongly")
    assertPlan("video_meta_mixed", planOf(mixedDf))
    graft.CacheRegistry.releaseAll()

    // ---- decode tier: fragmented jpeg through the pupil kernel ----
    val decIds = spark.range(nDecode).toDF("doc_id")
    val det = VisionOps.detectPupilsVideo(
      VisionFixtures.plantMedia(decIds, "doc_id", "video_mp4_frag"))
    val t1 = System.nanoTime()
    val nDet = det.count()
    val decSec = (System.nanoTime() - t1) / 1e9
    // Σ nf over id in [0, nDecode): nf(id) = 2 + id % 3
    val expectedDet = (0L until nDecode).map(2 + _ % 3).sum
    assert(nDet == expectedDet,
      s"decode tier lost frames: $nDet of $expectedDet")
    assertPlan("mp4_decode", planOf(det))

    println(f"[mp4scan100x] meta tier: $nMeta%d fragmented avc1 blobs " +
      f"listed in $metaSec%.1f s (${nMeta / metaSec}%.0f blobs/s), " +
      f"0 mismatches; mixed tier: $nMixed%d four-container blobs " +
      f"listed in $mixedSec%.1f s (${nMixed / mixedSec}%.0f blobs/s), " +
      f"0 mismatches; decode tier: $nDecode%d jpeg blobs -> $nDet%d " +
      f"detection rows in $decSec%.1f s (${nDecode / decSec}%.0f blobs/s)")
    spark.stop()
  }
}
