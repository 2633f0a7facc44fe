package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage attribution for the m9_binocular composed head
  * (r11 verdict #2's "fixture entries or stage timers" — the fixture
  * entry landed in r12; this is the stage-timer half). Phases:
  *
  *  1. inputs   — drain the three planted projections (events scan +
  *                synthesis arithmetic; ≈ the bench fixture entry)
  *  2. fit      — Calibrator.fitBinocular (triple as-of join, collect
  *                of the session-bounded match table, three driver
  *                pinv fits)
  *  3. merge    — BinocularMerge.mergeBatch drained (the sorted FSM)
  *  4. full     — the whole binocularPipeline query (apply + planted
  *                check + ErrorMap ride on top of 1-3's lineages)
  *
  * Run: `runMain graft.tools.M9Probe [sfDir]`. */
object M9Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // one warm pass absorbs JIT/codegen (the bench-warmup discipline);
    // warm on the small sibling fixture when it exists, else the
    // measured dir itself (ADVICE r12: a hardcoded path died on boxes
    // without it, and silently warmed a different lineage than timed)
    val warmDir = {
      val small = new java.io.File(
        new java.io.File(dir).getParentFile, "sf0.001")
      if (small.isDirectory) small.getPath else dir
    }
    drain(graft.Queries.binocularPipeline(spark, warmDir))

    val (markers, p0, p1) = graft.Queries.m9bInputs(spark, dir)
    time("inputs") {
      val shape = (df: org.apache.spark.sql.DataFrame) => df.select(
        col("session"), col("timestamp"), col("norm_x"), col("norm_y"))
      drain(shape(markers).unionByName(shape(p0)).unionByName(shape(p1)))
    }
    val models = time("fit") {
      graft.model.Calibrator.fitBinocular(markers, p0, p1).get
    }
    // finer fit attribution: the triple match+collect vs the driver fits
    val matchedRows = time("fit.match") {
      import graft.operators.AsOfJoin
      val m = markers.select(col("timestamp"), col("norm_x").as("mx"),
        col("norm_y").as("my"))
      def eye(df: org.apache.spark.sql.DataFrame, p: String) = df.select(
        col("timestamp"), col("norm_x").as(s"${p}x"),
        col("norm_y").as(s"${p}y"), col("confidence").as(s"${p}c"))
      AsOfJoin.triple(m, eye(p0, "p0"), eye(p1, "p1"),
          "timestamp", "timestamp", "timestamp", Nil)
        .filter(col("a_p0c") > 0.75 && col("b_p1c") > 0.75)
        .select("a_p0x", "a_p0y", "b_p1x", "b_p1y", "mx", "my").collect()
    }
    println(s"[probe] matched rows = ${matchedRows.length}")
    time("fit.poly") {
      val ins = matchedRows.map(r => Array(r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
      val mx = matchedRows.map(_.getDouble(4))
      val my = matchedRows.map(_.getDouble(5))
      graft.model.Poly.calibrateRaw(ins, mx, my, n = 13)
      graft.model.Poly.calibrate(ins.map(a => Array(a(0), a(1))), mx, my, n = 7)
      graft.model.Poly.calibrate(ins.map(a => Array(a(2), a(3))), mx, my, n = 7)
    }
    time("merge") {
      import graft.streaming.BinocularMerge
      def asPupil(df: org.apache.spark.sql.DataFrame, id: Int) = df.select(
        col("session"), col("timestamp"), lit(id).as("id"),
        col("norm_x").as("x"), col("norm_y").as("y"), col("confidence"))
      drain(BinocularMerge.mergeBatch(
        asPupil(p0, 0).unionByName(asPupil(p1, 1))
          .as[BinocularMerge.Pupil]).toDF())
    }
    val _ = models
    time("full") {
      drain(graft.Queries.binocularPipeline(spark, dir))
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
