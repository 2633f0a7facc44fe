package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL registration surface: the same native kernels behind the
  * Column API, reachable from pure SQL via `spark.sql.extensions` or
  * `GraftExtensions.install`, with results identical to the DataFrame
  * paths and without leaking into sessions that didn't opt in.
  *
  * Order matters: the `spark.sql.extensions` config test runs LAST —
  * registering the static conf on the shared SparkContext makes every
  * session built afterwards in this JVM pick the extensions up (Spark's
  * documented static-conf semantics), which would invalidate the
  * isolation assertion.
  */
class ExtensionsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** Fresh isolated session (shared context, own FunctionRegistry). */
  private def installed(): SparkSession = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s
  }

  test("functions do not leak into sessions that did not opt in") {
    installed() // a registered sibling must not affect the next line
    val other = spark.newSession()
    val e = intercept[AnalysisException] {
      other.sql("SELECT graft_array_dot(array(1.0d), array(1.0d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_array_dot"))
  }

  test("SQL dot/sq_dist match the Column API on real embeddings") {
    val s = installed()
    val emb = Tables.embeddings(s, dir).limit(200)
    emb.createOrReplaceTempView("emb")
    // SQL side hands the raw float embeddings to the function (the
    // builder casts); the Column API contract stays explicit-double.
    val sql = s.sql(
      """SELECT vec_id, graft_array_dot(embedding, embedding) AS d,
        |  graft_array_sq_dist(embedding, embedding) AS sq
        |FROM emb""".stripMargin)
      .orderBy("vec_id").collect()
    val dv = col("embedding").cast("array<double>")
    val api = emb.select(col("vec_id"),
        graft.functions.ArrayDot.array_dot(dv, dv).as("d"),
        graft.functions.ArrayDot.array_sq_dist(dv, dv).as("sq"))
      .orderBy("vec_id").collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("SQL shingle/minhash match TextOps (join-compatible signatures)") {
    val s = installed()
    Tables.documents(s, dir).limit(100).createOrReplaceTempView("docs")
    val sql = s.sql(
      """SELECT doc_id, graft_minhash_sig(graft_shingle_hash60(text, 3), 16)
        |  AS sig FROM docs WHERE length(text) > 0""".stripMargin)
      .orderBy("doc_id").collect()
    val api = Tables.documents(s, dir).limit(100)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), graft.functions.TextHash.minhash_sig(
        graft.functions.TextHash.shingle_hash60(col("text"), 3, operators.TextOps.HashMod),
        operators.TextOps.MinhashA.take(16).toSeq,
        operators.TextOps.MinhashB.take(16).toSeq,
        operators.TextOps.HashMod).as("sig"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("SQL bpe token count matches the Column API") {
    val s = installed()
    Tables.documents(s, dir).limit(100).createOrReplaceTempView("docs_bpe")
    val sql = s.sql(
      "SELECT doc_id, graft_bpe_token_count(text) AS n FROM docs_bpe")
      .orderBy("doc_id").collect()
    val api = Tables.documents(s, dir).limit(100)
      .select(col("doc_id"),
        operators.TextOps.bpeTokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("SQL bpe MERGE count matches the Column API kernel") {
    val s = installed()
    Tables.documents(s, dir).limit(100).createOrReplaceTempView("docs_bpem")
    val sql = s.sql(
      "SELECT doc_id, graft_bpe_merge_count(text) AS n FROM docs_bpem")
      .orderBy("doc_id").collect()
    val api = Tables.documents(s, dir).limit(100)
      .select(col("doc_id"),
        operators.TextOps.mergeBpeTokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
    // exact merge count is bounded above by the pre-token-unit count only
    // after merging shrinks it: merged <= plain char count, >= pre-tokens
    val both = Tables.documents(s, dir).limit(100)
      .select(operators.TextOps.bpeTokenCount(col("text")).as("pre"),
        operators.TextOps.mergeBpeTokenCount(col("text")).as("merged"))
      .collect()
    both.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      "merged tokens are sub-word: at least one per pre-token"))
  }

  test("SQL tps_eval matches the Column API kernel") {
    val s = installed()
    import s.implicits._
    val pts = Seq((0.1, 0.2), (0.7, 0.4), (0.5, 0.9)).toDF("px", "py")
    pts.createOrReplaceTempView("pts")
    val ax = "array(0.0d, 1.0d, 0.0d, 1.0d)"
    val ay = "array(0.0d, 0.0d, 1.0d, 1.0d)"
    val th = "array(0.3d, -0.2d, 0.1d, 0.05d, 0.7d, 1.1d, -0.4d)"
    val sql = s.sql(
      s"SELECT graft_tps_eval(px, py, $ax, $ay, $th) AS g FROM pts")
      .collect().map(_.getDouble(0)).toSeq
    val api = pts.select(graft.functions.TpsEval.tps_eval(col("px"), col("py"),
        expr(ax), expr(ay), expr(th)).as("g"))
      .collect().map(_.getDouble(0)).toSeq
    assert(sql == api)
  }

  test("SQL plan contains the native kernel (not a HOF rewrite)") {
    val s = installed()
    Tables.embeddings(s, dir).createOrReplaceTempView("emb2")
    val p = s.sql("SELECT graft_array_dot(embedding, embedding) AS d FROM emb2")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(p.contains("arraydotproduct"), s"native kernel missing from:\n$p")
  }

  test("arity and literal-argument errors are explicit") {
    val s = installed()
    val e1 = intercept[Exception] {
      s.sql("SELECT graft_array_dot(array(1.0d))").collect()
    }
    assert(e1.getMessage.contains("graft_array_dot") ||
      e1.getMessage.toLowerCase.contains("argument"))
    val e2 = intercept[Exception] {
      Tables.documents(s, dir).limit(1).createOrReplaceTempView("d1")
      s.sql("SELECT graft_shingle_hash60(text, length(text)) FROM d1").collect()
    }
    assert(e2.getMessage.contains("integer literal") ||
      e2.getMessage.toLowerCase.contains("literal"))
  }

  test("SQL warc/gzip functions match the Column API kernels") {
    GraftExtensions.install(spark)
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://a\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    val row = spark.sql(
      s"""SELECT inline(graft_warc_records('${rec.replace("\r", "\\r")
        .replace("\n", "\\n")}'))""").collect()
    assert(row.length == 1 && row.head.getString(1) == "http://a" &&
      row.head.getString(3) == "hello")
    // gzip -> gunzip identity through SQL
    val rt = spark.sql(
      "SELECT decode(graft_gunzip(graft_gzip(encode('abc', 'UTF-8'))), " +
        "'UTF-8') AS s").head.getString(0)
    assert(rt == "abc")
    // corrupt input -> null, not a thrown task
    assert(spark.sql(
      "SELECT graft_gunzip(encode('nope', 'UTF-8')) IS NULL AS n")
      .head.getBoolean(0))
  }

  test("builder extensions path registers the functions") {
    // `--conf spark.sql.extensions=graft.GraftExtensions` loads the class
    // by name and calls the same `apply` this drives via withExtensions;
    // the conf form needs the SparkContext to be BUILT with it (its
    // spark-submit semantics), which a shared-context suite can't do
    // without polluting every later session in the JVM.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s.sql(
        "SELECT graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(r == 11.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
