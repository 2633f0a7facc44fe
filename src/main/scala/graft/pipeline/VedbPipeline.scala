package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Calibrator, ErrorMap, GazeModelIO}
import graft.operators.MarkerParsing

/** `pipeline_vedb` as a registered [[Pipeline]] composition
  * (pipelines.py:557-819): detection tables in → error summary out, with
  * the orchestrator's S8 memoization and S7 failure short-circuit at every
  * stage boundary.
  *
  * Stage graph (each stage a Parquet artifact under the run root):
  *
  *   markers_filtered  — filter_and_cluster (A1→W3→P7→W2→A7→A3)
  *   ├─ markers_cal    — earliest surviving epoch (calibration epoch)
  *   └─ markers_val    — remaining epochs (validation)
  *   calibration       — Calibrator.fit on markers_cal (model table row;
  *                       a rejected fit raises → S7 Failed sentinel)
  *   gaze              — model table → distributed Column apply on pupils
  *   error             — ErrorMap vs markers_val (one summary row)
  *
  * The calibration artifact is the [[GazeModelIO]] typed one-row layout,
  * so a memoized re-run reconstructs the model from Parquet without
  * refitting — the reference's .npz reuse semantics.
  */
object VedbPipeline {
  import Pipeline.Stage

  private def named(df: DataFrame): DataFrame = df.select(
    col("timestamp"),
    element_at(col("norm_pos"), 1).as("norm_x"),
    element_at(col("norm_pos"), 2).as("norm_y"),
    col("marker_cluster_index"))

  /** Epoch id of the earliest epoch (the session's calibration epoch). */
  private def calEpoch(f: DataFrame): Long =
    f.groupBy("epoch").agg(min("timestamp").as("t0"))
      .orderBy("t0").select("epoch").limit(1).collect()
      .headOption.map(_.getLong(0))
      .getOrElse(throw new IllegalStateException(
        "no epochs survived marker filtering"))

  def stages(markers: DataFrame, clock: DataFrame, pupils: DataFrame,
             cfg: Calibrator.Config = Calibrator.Config(),
             epochDuration: (Double, Double) = (30.0, 150.0),
             clusterDuration: (Double, Double) = (0.2, 5.0),
             errorResolution: (Int, Int) = (60, 80)): Seq[Stage] = Seq(
    Stage("markers_filtered", Nil, (_, _) =>
      MarkerParsing.filterAndCluster(markers, clock,
        epochDuration = epochDuration, clusterDuration = clusterDuration)),
    Stage("markers_cal", Seq("markers_filtered"), (_, in) => {
      val f = in("markers_filtered")
      f.filter(col("epoch") === calEpoch(f))
    }),
    // derives the calibration epoch from the (tiny) markers_cal artifact
    // instead of re-running the epoch-min aggregation over the full
    // filtered table a second time
    Stage("markers_val", Seq("markers_filtered", "markers_cal"), (_, in) => {
      val cal = in("markers_cal").select("epoch").limit(1).collect()
        .headOption.map(_.getLong(0))
        .getOrElse(throw new IllegalStateException("empty calibration epoch"))
      in("markers_filtered").filter(col("epoch") =!= cal)
    }),
    Stage("calibration", Seq("markers_cal"), (s, in) => {
      val model = Calibrator.fit(named(in("markers_cal")), pupils, cfg)
        .getOrElse(throw new IllegalStateException(
          "calibration rejected all points"))
      GazeModelIO.toDF(s, model)
    }),
    Stage("gaze", Seq("calibration"), (_, in) =>
      GazeModelIO.fromDF(in("calibration")).transform(pupils)
        .select(col("timestamp"), col("gaze_x").as("norm_x"),
          col("gaze_y").as("norm_y"), col("confidence"))),
    Stage("error", Seq("gaze", "markers_val"), (_, in) =>
      ErrorMap.compute(named(in("markers_val")), in("gaze"),
        ErrorMap.Config(resolution = errorResolution)).summary))

  /** Run the full composition; returns the per-stage status map. */
  def run(spark: SparkSession, root: String, markers: DataFrame,
          clock: DataFrame, pupils: DataFrame,
          cfg: Calibrator.Config = Calibrator.Config(),
          epochDuration: (Double, Double) = (30.0, 150.0),
          clusterDuration: (Double, Double) = (0.2, 5.0),
          tags: Map[String, String] = Map.empty): Map[String, Pipeline.StageResult] =
    Pipeline.run(spark, root,
      stages(markers, clock, pupils, cfg, epochDuration, clusterDuration),
      tags)

  /** The MANUAL-epoch branch of pipeline_vedb: when the session carries a
    * curated `marker_times.yaml`, the reference scans exactly those frame
    * ranges instead of gap-splitting (split_time, pipelines.py:630-649)
    * and runs one validation pass PER manual epoch (:672-693). Stage
    * graph: `markers_cal` (calibration ranges → filter_and_cluster) →
    * `calibration` → `gaze` → per validation epoch j: `markers_val_<j>` →
    * `error_<j>`. Epoch-duration gates are skipped — the curated ranges
    * ARE the epochs (the internal gap split still runs and is the
    * identity on a contiguous range). */
  def manualStages(markers: DataFrame, clock: DataFrame, pupils: DataFrame,
                   calEpochs: Seq[ManualEpochs.Epoch],
                   valEpochs: Seq[ManualEpochs.Epoch],
                   cfg: Calibrator.Config = Calibrator.Config(),
                   clusterDuration: (Double, Double) = (0.2, 5.0),
                   errorResolution: (Int, Int) = (60, 80)): Seq[Pipeline.Stage] = {
    require(calEpochs.nonEmpty, "manual pipeline needs >= 1 calibration epoch")
    def cluster(sub: DataFrame) =
      MarkerParsing.filterAndCluster(
        sub.drop("epoch", "frame_index"), clock,
        // a curated range is one epoch by construction — no duration gate
        epochDuration = (0.0, Double.MaxValue),
        clusterDuration = clusterDuration)
    def slice(epochs: Seq[ManualEpochs.Epoch]) =
      ManualEpochs.splitByFrames(markers, clock, "timestamp", "timestamp",
        epochs)
    val calStage = Stage("markers_cal", Nil, (_, _) => cluster(slice(calEpochs)))
    val fitStage = Stage("calibration", Seq("markers_cal"), (s, in) => {
      val model = Calibrator.fit(named(in("markers_cal")), pupils, cfg)
        .getOrElse(throw new IllegalStateException(
          "calibration rejected all points"))
      GazeModelIO.toDF(s, model)
    })
    val gazeStage = Stage("gaze", Seq("calibration"), (_, in) =>
      GazeModelIO.fromDF(in("calibration")).transform(pupils)
        .select(col("timestamp"), col("gaze_x").as("norm_x"),
          col("gaze_y").as("norm_y"), col("confidence")))
    val valStages = valEpochs.flatMap { e =>
      Seq(
        Stage(s"markers_val_${e.epoch}", Nil, (_, _) =>
          cluster(slice(Seq(e)))),
        Stage(s"error_${e.epoch}", Seq("gaze", s"markers_val_${e.epoch}"),
          (_, in) => ErrorMap.compute(named(in(s"markers_val_${e.epoch}")),
            in("gaze"), ErrorMap.Config(resolution = errorResolution)).summary))
    }
    Seq(calStage, fitStage, gazeStage) ++ valStages
  }
}
