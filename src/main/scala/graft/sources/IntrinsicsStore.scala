package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: per-camera intrinsics keyed by (camera, resolution) — the
  * reference's msgpack side-store (externals/file_methods.py:348-407)
  * restated as a small config table (camera_matrix 3×3 row-major,
  * distortion coefficients, model name). Broadcast-sized; joins onto
  * frame tables by (camera, width, height). */
object IntrinsicsStore {

  case class Intrinsics(camera: String, width: Int, height: Int,
                        model: String, cameraMatrix: Seq[Double],
                        distCoeffs: Seq[Double])

  def toDf(spark: SparkSession, entries: Seq[Intrinsics]): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Attach intrinsics to a frame table by camera + resolution (broadcast
    * join — the store is tens of rows). */
  def attach(frames: DataFrame, intrinsics: DataFrame,
             cameraCol: String = "camera", widthCol: String = "width",
             heightCol: String = "height"): DataFrame =
    frames.join(broadcast(intrinsics),
      frames(cameraCol) === intrinsics("camera") &&
        frames(widthCol) === intrinsics("width") &&
        frames(heightCol) === intrinsics("height"), "left")
      .drop(intrinsics("camera")).drop(intrinsics("width"))
      .drop(intrinsics("height"))
}
