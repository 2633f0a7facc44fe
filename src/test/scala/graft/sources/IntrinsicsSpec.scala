package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntrinsicsSpec extends SparkSpec {
  import spark.implicits._
  import IntrinsicsStore._

  test("intrinsics round-trip and broadcast-attach by resolution (S9)") {
    val store = toDf(spark, Seq(
      Intrinsics("world", 2048, 1536, "radial",
        Seq(1000.0, 0, 1024, 0, 1000, 768, 0, 0, 1), Seq(0.1, -0.05)),
      Intrinsics("eye0", 400, 400, "radial",
        Seq(300.0, 0, 200, 0, 300, 200, 0, 0, 1), Seq(0.0, 0.0))))
    val p = Files.createTempDirectory("intr").toString + "/store"
    save(store, p)
    val loaded = load(spark, p)
    assert(loaded.count() == 2)
    val frames = Seq(("world", 2048, 1536, 1L), ("eye0", 400, 400, 2L),
      ("world", 1024, 768, 3L)).toDF("camera", "width", "height", "frame_id")
    val out = attach(frames, loaded).orderBy("frame_id").collect()
    assert(out(0).getAs[String]("model") == "radial")
    assert(out(1).getAs[scala.collection.Seq[Double]]("cameraMatrix").head == 300.0)
    assert(out(2).isNullAt(out(2).fieldIndex("model"))) // unknown resolution
  }
}
