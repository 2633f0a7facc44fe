package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioOps, VisionFixtures, VisionOps}
import graft.operators.{LabelingOps, TextOps}
import graft.sources.{PldataSource, PldataV2}

object ChaosRetrySpec {
  /** Counts injected throws so every test can prove a failure actually
    * happened (a chaos spec that never fails tests nothing). Static:
    * accumulators drop failed-attempt updates by design, but local-mode
    * tasks share this JVM. */
  val injected = new AtomicInteger(0)
}

/** Retry-idempotence chaos tier (r12 verdict #2): at 100 TB the dominant
  * runtime event is task retry after executor loss, an axis local[32]
  * never exercises on its own. The session runs with maxFailures = 2
  * (`local[4, 2]`, SparkSpec); each test injects a FIRST-attempt failure
  * mid-partition — after the kernel has already consumed and emitted
  * rows — and asserts the retried run's result is bit-identical to the
  * undisturbed run. Covers one kernel per mapPartitions family: vision
  * decode, audio FFT, the blink FSM's grouped sort, the CDC gram-hash
  * chain, and the pldata DSv2 reader (whose seam is the scan itself, so
  * the failure is injected inside the reader via a dev-only option). */
class ChaosRetrySpec extends SparkSpec {
  import spark.implicits._

  /** Wrap a small DataFrame so that on every task's FIRST attempt the
    * iterator throws after yielding `failAfter` rows — downstream
    * kernels in the same stage have real partial output in flight when
    * the task dies. Second attempts pass through untouched. */
  private def chaos(df: DataFrame, failAfter: Int = 1): DataFrame = {
    val schema = df.schema
    val wrapped = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        var n = 0
        it.map { r =>
          if (n >= failAfter) {
            ChaosRetrySpec.injected.incrementAndGet()
            throw new java.io.IOException(
              "graft chaos: injected first-attempt failure")
          }
          n += 1; r
        }
      } else it
    }
    df.sparkSession.createDataFrame(wrapped, schema)
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  private def assertChaosHappened(before: Int): Unit =
    assert(ChaosRetrySpec.injected.get() > before,
      "no failure was injected — the chaos spec exercised nothing")

  test("vision decode kernel: retried run == undisturbed run") {
    val ids = Seq(0L, 3L, 5L, 8L, 11L, 14L).toDF("doc_id").repartition(3)
    val media = VisionFixtures.plantMedia(ids, "doc_id", "pupil")
    val want = canon(VisionOps.detectPupils(media).collect())
    val c0 = ChaosRetrySpec.injected.get()
    val got = canon(VisionOps.detectPupils(chaos(media)).collect())
    assertChaosHappened(c0)
    assert(got == want && want.nonEmpty,
      "vision decode diverged after a task retry")
  }

  test("audio FFT kernel: retried run == undisturbed run") {
    // 512-sample square waves at three half-periods (the spectral
    // fixture family) — enough rows that every partition outlives the
    // failAfter=1 cut
    val media = (0 until 6).map { i =>
      val hp = 4 + (i % 3)
      val samples = Array.tabulate(600)(j =>
        if ((j / hp) % 2 == 0) 1000 * (i + 1) else -1000 * (i + 1))
      (i.toLong, AudioOps.encodeWavMono(8000, samples))
    }.toDF("media_id", "bytes").repartition(3)
    val want = canon(AudioOps.spectralFeatures(media).collect())
    val c0 = ChaosRetrySpec.injected.get()
    val got = canon(AudioOps.spectralFeatures(chaos(media)).collect())
    assertChaosHappened(c0)
    assert(got == want && want.nonEmpty,
      "audio FFT diverged after a task retry")
  }

  test("blink FSM (grouped sort + shuffle map side): retried == undisturbed") {
    val dist = Array.fill(10)(1.4) ++
      Array(1.15, 0.9, 0.65, 0.4, 0.15, 0.15) ++
      Array(0.35, 0.55, 0.75, 0.95, 1.15, 1.35, 1.4) ++ Array.fill(10)(1.4)
    val rows = for {
      eye <- Seq(0, 1, 2, 3)
      (d, i) <- dist.zipWithIndex
    } yield (eye, i / 120.0, d)
    val df = rows.toDF("eye", "t", "d").repartition(4)
    def run(in: DataFrame) = canon(LabelingOps.blinkSegments(
      in, "t", "d", Seq("eye"), negVel = -0.15, posVel = 0.15).collect())
    val want = run(df)
    val c0 = ChaosRetrySpec.injected.get()
    // failAfter = 5: the map-side task dies after feeding the shuffle
    // writer real rows; the retry must rewrite that shuffle output
    val got = run(chaos(df, failAfter = 5))
    assertChaosHappened(c0)
    assert(got == want && want.nonEmpty,
      "blink FSM diverged after a map-side task retry")
  }

  test("CDC gram-hash chain (row-local text kernel): retried == undisturbed") {
    val docs = (0L until 24L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i " * 8))
      .toDF("doc_id", "text").repartition(4)
    def run(in: DataFrame) = canon(
      TextOps.cdcChunks(in, "doc_id", "text").collect())
    val want = run(docs)
    val c0 = ChaosRetrySpec.injected.get()
    val got = run(chaos(docs, failAfter = 2))
    assertChaosHappened(c0)
    assert(got == want && want.nonEmpty,
      "CDC chunking diverged after a task retry")
  }

  test("pldata V2 sink: writer task death → abort cleans, retry commits once") {
    // the WRITE side of the retry story: the task dies after the
    // DataWriter has already streamed real records into its temp dir;
    // abort() must clean that attempt and the retry's commit must
    // produce exactly the undisturbed shard set (no dup rows, no
    // leftover _tmp- attempt dirs — the 100 TB sink invariant)
    val dir = java.nio.file.Files.createTempDirectory("pldata_chaos_w").toString
    val rows = (0 until 40).map(i => (
        100.0 + i, Seq(i / 10.0, i / 20.0), 0.5 + i / 100.0, i.toLong))
      .toDF("timestamp", "norm_pos", "confidence", "id")
      .repartition(2)
    val c0 = ChaosRetrySpec.injected.get()
    chaos(rows, failAfter = 7).write.format("pldata")
      .option("topic", "gaze").mode("append").save(dir)
    assertChaosHappened(c0)
    val got = spark.read.format("pldata").option("topic", "gaze")
      .option("recursive", "true")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("timestamp",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .load(dir)
      .select("id", "timestamp").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got == (0 until 40).map(i => (i.toLong, 100.0 + i)),
      "retried write lost or duplicated rows")
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_tmp-"))
    assert(leftovers.isEmpty,
      s"aborted attempt left temp dirs: ${leftovers.map(_.getName).toSeq}")
  }

  test("pldata DSv2 reader: mid-read task death, retry re-opens the file") {
    val dir = java.nio.file.Files.createTempDirectory("pldata_chaos").toString
    val rows = (0 until 40).map(i => (
        "gaze", 100.0 + i, Seq(i / 10.0, i / 20.0), 0.5 + i / 100.0, i.toLong))
      .toDF("topic", "timestamp", "norm_pos", "confidence", "id")
    PldataSource.write(rows, dir, "gaze")
    def dump(df: DataFrame) = canon(df
      .select(col("id"), col("timestamp"), col("confidence"),
        element_at(col("norm_pos"), 1).as("nx")).collect())
    val want = dump(
      spark.read.format("pldata").option("topic", "gaze").load(dir))
    val c0 = PldataV2.chaosInjected.get()
    val got = dump(spark.read.format("pldata").option("topic", "gaze")
      .option("chaosFailFirstAttemptAfter", "7").load(dir))
    assert(PldataV2.chaosInjected.get() > c0,
      "no failure was injected inside the pldata reader")
    assert(got == want && want.nonEmpty,
      "pldata DSv2 read diverged after a reader task retry")
  }
}
