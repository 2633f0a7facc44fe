package graft

import org.apache.spark.sql.types._

/** The Verify-side driver-comparator lint (r16 verdict #2): the driver's
  * oracle harness sorts result rows by every column before hashing and
  * cannot sort array/struct/map cells, so multi-row outputs must be
  * fully scalar. Single-row results are exempt (no sort happens). */
class VerifyLintSpec extends SparkSpec {

  private val scalarSchema = StructType(Seq(
    StructField("session", StringType),
    StructField("n", LongType),
    StructField("score", DoubleType)))

  private val arraySchema = StructType(Seq(
    StructField("session", StringType),
    StructField("conf_deciles_l", ArrayType(DoubleType)),
    StructField("conf_deciles_r", ArrayType(DoubleType))))

  test("multi-row output with array columns is flagged, naming them") {
    assert(Verify.complexColumnViolations(arraySchema, 20L) ==
      Seq("conf_deciles_l", "conf_deciles_r"))
  }

  test("single-row outputs are exempt (a10_avg_frames class)") {
    assert(Verify.complexColumnViolations(arraySchema, 1L).isEmpty)
    assert(Verify.complexColumnViolations(arraySchema, 0L).isEmpty)
  }

  test("scalar multi-row outputs pass") {
    assert(Verify.complexColumnViolations(scalarSchema, 10000L).isEmpty)
  }

  test("struct and map columns are complex too") {
    val s = StructType(Seq(
      StructField("k", StringType),
      StructField("e", StructType(Seq(StructField("x", DoubleType)))),
      StructField("m", MapType(StringType, LongType))))
    assert(Verify.complexColumnViolations(s, 2L) == Seq("e", "m"))
  }

  test("qc_session_report itself is now lint-clean (the r16 red row)") {
    val df = Queries.qcSessionReport(spark, "/root/testdata/sf0.001")
    val n = df.count()
    assert(n > 1, "qc report must stay multi-row for this pin to bite")
    assert(Verify.complexColumnViolations(df.schema, n).isEmpty)
  }
}
