package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = MultimodalOps.packAsMedia(
    Seq((1L, "hello world"), (2L, "a much longer document body here"),
      (3L, "")).toDF("id", "txt"), "id", "txt")

  test("packAsMedia produces the binary+meta schema") {
    assert(media.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val m = media.filter(col("media_id") === 1).select("meta.width").collect()
    assert(m(0).getInt(0) == 11 % 640 + 16)
  }

  test("extractFeatures: deterministic, normalized, fixed-dim") {
    val f = MultimodalOps.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L).length == MultimodalOps.FeatureDim)
    assert(math.abs(f(1L).sum - 1f) < 1e-5) // normalized histogram
    assert(f(3L).sum == 0f) // empty bytes → zero vector
    val f2 = MultimodalOps.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f == f2)
  }

  test("sampleFrames fans out by stride and keeps metadata") {
    val frames = MultimodalOps.sampleFrames(media, 2)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nf = media.select(col("media_id"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    nf.foreach { case (id, n) =>
      assert(byId(id) == (0 until n by 2).length ||
        (n == 0 && byId(id) == 1))
    }
  }

  test("resizeMeta scales dimensions, preserves bytes untouched") {
    val r = MultimodalOps.resizeMeta(media, 0.5)
      .filter(col("media_id") === 2)
      .select(col("meta.width"), col("bytes")).collect()(0)
    val orig = media.filter(col("media_id") === 2)
      .select(col("meta.width"), col("bytes")).collect()(0)
    assert(r.getInt(0) == (orig.getInt(0) * 0.5).toInt)
    assert(r.getAs[Array[Byte]](1).sameElements(orig.getAs[Array[Byte]](1)))
  }
}
