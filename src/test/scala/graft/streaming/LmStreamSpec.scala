package graft.streaming

import graft.SparkSpec
import graft.operators.{LmModelIO, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** LM build/serve split ([[LmModelIO]]): the frozen-model score must
  * reproduce the inline [[TextOps.lmScore]] rows on the build corpus,
  * extend to unseen documents via the add-one floor, and run UNCHANGED
  * over a stream — the serving plan is row-local (one-row broadcast
  * model + per-doc fold), so score-at-ingest is append-mode stateless. */
class LmStreamSpec extends SparkSpec {
  import spark.implicits._

  val corpus = Seq(
    Doc(1L, "the cat sat on the mat"),
    Doc(2L, "the cat ran to the mat"),
    Doc(3L, "a dog sat on a rug"),
    Doc(4L, "solo"),
    Doc(5L, ""),
    Doc(6L, "the cat sat on the rug again and again"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lm_model").toString

  test("frozen score == inline lmScore on the build corpus") {
    val dir = tmp()
    LmModelIO.build(corpus.toDF(), "doc_id", "text", dir)
    val frozen = LmModelIO.score(spark, dir, corpus.toDF(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    val inline = TextOps.lmScore(corpus.toDF(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    graft.CacheRegistry.releaseAll()
    assert(frozen == inline)
  }

  test("unseen words score at the add-one floor, not an error") {
    val dir = tmp()
    LmModelIO.build(corpus.toDF(), "doc_id", "text", dir)
    val out = LmModelIO.score(spark, dir,
        Seq(Doc(100L, "zz qq zz"), Doc(101L, "the cat")).toDF(),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    graft.CacheRegistry.releaseAll()
    // unseen bigrams: p = 1/(0+V) — finite, and WORSE than a corpus one
    assert(out(0)._2 == 2L && out(1)._2 == 1L)
    assert(out(0)._3 > out(1)._3)
  }

  test("scoreJoin (inline-join serving form) == broadcast score, bit-exact") {
    val dir = tmp()
    LmModelIO.build(corpus.toDF(), "doc_id", "text", dir)
    // build corpus + unseen docs in one batch: the join form must hit the
    // same add-one floors (left-join nulls) the broadcast map lookups do
    val batch = (corpus ++ Seq(Doc(100L, "zz qq zz"), Doc(101L, "the cat"),
      Doc(102L, ""))).toDF()
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    val viaBroadcast = dump(
      LmModelIO.score(spark, dir, batch, "doc_id", "text"))
    val viaJoin = dump(
      LmModelIO.scoreJoin(spark, dir, batch, "doc_id", "text"))
    graft.CacheRegistry.releaseAll()
    // position-ordered fold in scoreJoin ⇒ identical fp sums, not just
    // round-6-equal — the == below is on raw doubles
    assert(viaJoin == viaBroadcast && viaJoin.size == corpus.size + 3)
  }

  test("score fails fast past maxBroadcastRows and names scoreJoin") {
    val dir = tmp()
    LmModelIO.build(corpus.toDF(), "doc_id", "text", dir)
    val err = intercept[IllegalArgumentException] {
      LmModelIO.score(spark, dir, corpus.toDF(), "doc_id", "text",
        maxBroadcastRows = 1L)
    }
    assert(err.getMessage.contains("scoreJoin"))
    // at the default cap the same model serves fine
    assert(LmModelIO.score(spark, dir, corpus.toDF(), "doc_id", "text")
      .count() == corpus.size)
    graft.CacheRegistry.releaseAll()
  }

  test("score-at-ingest: stream == batch across micro-batch splits") {
    val dir = tmp()
    LmModelIO.build(corpus.toDF(), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = LmModelIO.score(spark, dir, input.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("lm_ingest")
      .outputMode("append").start()
    input.addData(corpus.take(2))
    q.processAllAvailable()
    input.addData(corpus.slice(2, 5))
    q.processAllAvailable()
    input.addData(corpus.drop(5))
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    q.stop()
    assert(stateOps.isEmpty, s"lm score grew state: $stateOps")
    val got = spark.table("lm_ingest").orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val want = LmModelIO.score(spark, dir, corpus.toDF(), "doc_id", "text")
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(got == want && got.size == corpus.size)
  }
}
