package graft.model

import org.apache.spark.sql.SparkSession

/** M9 artifact persistence — the reference saves fitted calibrations as
  * .npz with pickled object arrays (calibration.py:675-690); here models
  * are typed Parquet rows (no opaque blobs), readable by any engine.
  *
  * Layout: one row, columns (model_type, n, cx, cy, anchors_x, theta_x,
  * anchors_y, theta_y) with nulls for the unused family.
  */
object GazeModelIO {

  /** Model → the one-row typed DataFrame (the persisted layout, also used
    * directly as a pipeline-stage artifact). */
  def toDF(spark: SparkSession, model: GazeModel): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val row = model match {
      case PolyMapModel(cx, cy, n) =>
        ("poly", n, cx.toSeq, cy.toSeq,
          null: Seq[Seq[Double]], null: Seq[Double],
          null: Seq[Seq[Double]], null: Seq[Double])
      case TpsMapModel(ax, tx, ay, ty) =>
        ("tps", 0, null: Seq[Double], null: Seq[Double],
          ax.map(_.toSeq).toSeq, tx.toSeq, ay.map(_.toSeq).toSeq, ty.toSeq)
      case other =>
        throw new IllegalArgumentException(
          s"persistence for ${other.getClass.getSimpleName} not supported")
    }
    Seq(row).toDF("model_type", "n", "cx", "cy",
      "anchors_x", "theta_x", "anchors_y", "theta_y")
  }

  def save(spark: SparkSession, model: GazeModel, path: String): Unit =
    toDF(spark, model).write.mode("overwrite").parquet(path)

  /** Reconstruct a model from the one-row DataFrame layout. */
  def fromDF(df: org.apache.spark.sql.DataFrame): GazeModel = {
    val r = df.collect()(0)
    def arr(i: Int): Array[Double] =
      r.getAs[scala.collection.Seq[Double]](i).toArray
    def mat(i: Int): Array[Array[Double]] =
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](i)
        .map(_.toArray).toArray
    r.getAs[String]("model_type") match {
      case "poly" => PolyMapModel(arr(2), arr(3), r.getAs[Int]("n"))
      case "tps" => TpsMapModel(mat(4), arr(5), mat(6), arr(7))
      case t => throw new IllegalArgumentException(s"unknown model_type $t")
    }
  }

  def load(spark: SparkSession, path: String): GazeModel =
    fromDF(spark.read.parquet(path))
}
