package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._
  import Pipeline._

  def stages(failMid: Boolean): Seq[Stage] = Seq(
    Stage("src", Nil, (s, _) => {
      import s.implicits._
      Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v")
    }),
    Stage("mid", Seq("src"), (_, in) =>
      if (failMid) in("src").filter(col("v") > 1e9) // empty → failure
      else in("src").withColumn("v2", col("v") * 2)),
    Stage("out", Seq("mid"), (_, in) => in("mid").agg(sum("v2").as("s"))))

  test("stages run, memoize on re-run, and record status") {
    val root = Files.createTempDirectory("pipe").toString
    val r1 = Pipeline.run(spark, root, stages(failMid = false))
    assert(r1("src").state == Computed && r1("out").state == Computed)
    assert(r1("out").rows == 1)
    val r2 = Pipeline.run(spark, root, stages(failMid = false))
    assert(r2.values.forall(_.state == Memoized))
    val st = Pipeline.statusTable(spark, r2).collect()
    assert(st.length == 3 && st.forall(_.getAs[String]("state") == "Memoized"))
  }

  test("failure sentinel short-circuits downstream (S7) and persists") {
    val root = Files.createTempDirectory("pipe").toString
    val r = Pipeline.run(spark, root, stages(failMid = true))
    assert(r("src").state == Computed)
    assert(r("mid").state == Failed)
    assert(r("out").state == SkippedUpstreamFailure)
    // re-run: the sentinel short-circuits without recompute
    val r2 = Pipeline.run(spark, root, stages(failMid = true))
    assert(r2("mid").state == Failed &&
      r2("mid").error.contains("failed sentinel"))
  }

  test("different tags → different memoization namespaces") {
    val root = Files.createTempDirectory("pipe").toString
    val a = Pipeline.run(spark, root, stages(false), Map("conf" -> "a"))
    val b = Pipeline.run(spark, root, stages(false), Map("conf" -> "b"))
    assert(a("src").path != b("src").path)
    assert(b("src").state == Computed) // not memoized across tags
  }
}
