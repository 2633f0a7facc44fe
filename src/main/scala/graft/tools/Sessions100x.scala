package graft.tools

import graft.model.SessionCalibrator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× MULTI-SESSION standing for the gaze-calibration fan-out
  * ([[SessionCalibrator.fitTransform]]) — the r14 verdict's missing
  * standing on the reference-side surface: the vedb 100 TB axis is MANY
  * SESSIONS (SURVEY §6 — fleets of recording sessions, one calibration
  * per session), and `m9_multisession` proves the fan-out shape at 100
  * sessions only. This plants the same closed-form construction across
  * `nSessions` (default 10⁴ — 100× the query's axis): markers on the
  * 5×5 cluster grid, pupils a known inverse affine + deterministic
  * sub-milli jitter, so EVERY session's fitted TPS must reproduce the
  * planted affine within the m9 tolerance — `nSessions` independent
  * model fits, each checked analytically, zero misses required.
  *
  * Scale evidence asserted from the plan, not claimed: the whole
  * reduce → fit → apply lineage must contain NO single-partition
  * exchange, NO keyless window, and NO all-pairs join — every stage is
  * keyed by session, so the session axis scales by ADDING PARTITIONS
  * (sessions never co-mingle across an exchange; the fit fan-out is
  * embarrassingly parallel). Also measures sessions/sec for the
  * docs/SCALE.md record.
  *
  * Usage: runMain graft.tools.Sessions100x [nSessions]
  */
object Sessions100x {
  def main(args: Array[String]): Unit = {
    val nSessions = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the m9 planted construction, session-parameterized: 25 clusters
    // × 2 repeats per session, one marker per integer second, its pupil
    // 2 ms later (inside the 1/60 s nearest-match window; the next
    // marker a full second outside it). Shared construction:
    // PlantedSessions (one source of truth with Qc100x).
    val per = 50L
    val base = PlantedSessions.base(spark, nSessions, per)
    val markers = PlantedSessions.markers(base)
    val pupils = PlantedSessions.eye(base, 1, 0.002, lit(0.95))

    val t0 = System.nanoTime()
    val gaze = SessionCalibrator.fitTransform(markers, pupils, "session",
      window = 1.0 / 60.0)
    // plan evidence BEFORE the run: the fan-out must scale by partitions
    val p = gaze.queryExecution.executedPlan.toString
    val singleExchanges = p.split("\n").count(_.contains("Exchange SinglePartition"))
    val keyless = gaze.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }.length
    val allPairs = (if (p.contains("CartesianProduct")) 1 else 0) +
      (if (p.contains("BroadcastNestedLoopJoin")) 1 else 0)

    // the planted-affine check, per session: every gaze row within tol
    val (ax, ay) = PlantedSessions.forwardAffine(col("px"), col("py"))
    val perSession = gaze
      .join(pupils.select(col("session"), col("timestamp"),
        col("norm_x").as("px"), col("norm_y").as("py")),
        Seq("session", "timestamp"))
      .groupBy("session")
      .agg(count(lit(1)).as("n_gaze"),
        sum(when(abs(col("gaze_x") - ax) < 0.01 &&
          abs(col("gaze_y") - ay) < 0.01, 1L).otherwise(0L)).as("n_ok"))
    val agg = perSession.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_gaze") === per && col("n_ok") === per, 1L)
        .otherwise(0L)).as("n_green")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    graft.CacheRegistry.releaseAll()

    val (nCal, nGreen) = (agg.getLong(0), agg.getLong(1))
    println(s"""{"tool":"sessions_100x","n_sessions":$nSessions,""" +
      s""""rows":${nSessions * per * 2},"calibrated":$nCal,""" +
      s""""green":$nGreen,"single_partition_exchanges":$singleExchanges,""" +
      s""""keyless_windows":$keyless,"all_pairs_joins":$allPairs,""" +
      f""""sec":$sec%.1f,"sessions_per_sec":${nCal / sec}%.0f}""")
    require(nCal == nSessions && nGreen == nSessions,
      s"planted-oracle mismatch: $nCal calibrated, $nGreen green " +
        s"(expected $nSessions)")
    require(singleExchanges == 0 && keyless == 0 && allPairs == 0,
      "fan-out plan grew a single-partition stage or all-pairs join")
    println("[sessions_100x] PLANTED ORACLE GREEN (fan-out keyed end-to-end)")
    spark.stop()
  }
}
