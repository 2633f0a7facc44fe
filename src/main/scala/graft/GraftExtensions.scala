package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

import graft.functions.{ArrayDotProduct, ArraySqDist, TextHash, TpsEval}
import graft.operators.TextOps

/** SQL surface for the engine's native Catalyst kernels.
  *
  * Two registration paths, same function list:
  *  - cluster-wide, at session build time:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - on an already-running session: `GraftExtensions.install(spark)`
  *
  * Either way a pure-SQL user (spark-sql shell, JDBC/Thrift, notebook
  * `%%sql`) reaches the same one-eval-per-row kernels the Column API
  * uses — `graft_array_dot` instead of a re-derived HOF
  * aggregate/zip_with chain, `graft_shingle_hash60`/`graft_minhash_sig`
  * with the library's fixed universal-hash family so SQL-side signatures
  * are join-compatible with DataFrame-side dedup output.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** An optional trailing literal-int argument (k, numHashes, ...). */
  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an integer literal, got $other")
  }

  private def wrongArgs(name: String, expected: String, got: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name expects $expected argument(s), got $got")

  /** SQL-surface ergonomics: the kernels demand array<double>, but SQL
    * users hand us parquet float embeddings — cast instead of erroring
    * (SimplifyCasts removes the no-op on already-double input). */
  private def asDouble(e: Expression): Expression = e.dataType match {
    case ArrayType(FloatType, cn) => Cast(e, ArrayType(DoubleType, cn))
    case _ => e
  }

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape; `install` feeds the same list straight into a
    * live session's FunctionRegistry. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_array_dot"),
      info("graft_array_dot",
        "graft_array_dot(a, b) - dot product of two float/double arrays; " +
          "null on null input or length mismatch"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayDotProduct(asDouble(a), asDouble(b))
        case _ => wrongArgs("graft_array_dot", "2", args.length)
      }),
    (FunctionIdentifier("graft_array_sq_dist"),
      info("graft_array_sq_dist",
        "graft_array_sq_dist(a, b) - squared euclidean distance of two " +
          "float/double arrays; null on null input or length mismatch"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArraySqDist(asDouble(a), asDouble(b))
        case _ => wrongArgs("graft_array_sq_dist", "2", args.length)
      }),
    (FunctionIdentifier("graft_shingle_hash60"),
      info("graft_shingle_hash60",
        "graft_shingle_hash60(text[, k]) - distinct 60-bit hashes of the " +
          "word k-shingles of text (default k=3), reduced mod the " +
          "library's minhash modulus"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TextHash.ShingleHash60(t, 3, TextOps.HashMod)
        case Seq(t, k) =>
          TextHash.ShingleHash60(t,
            litInt("graft_shingle_hash60", "k", k), TextOps.HashMod)
        case _ => wrongArgs("graft_shingle_hash60", "1-2", args.length)
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes[, numHashes]) - minhash signature " +
          "(default 16 hashes, max 64) over a graft_shingle_hash60 array, " +
          "using the library's fixed universal-hash family; null on an " +
          "empty shingle set"),
      (args: Seq[Expression]) => {
        val (hv, n) = args match {
          case Seq(h) => (h, 16)
          case Seq(h, nh) => (h, litInt("graft_minhash_sig", "numHashes", nh))
          case _ => wrongArgs("graft_minhash_sig", "1-2", args.length)
        }
        require(n >= 1 && n <= TextOps.MinhashA.length,
          s"graft_minhash_sig: numHashes must be in [1, ${TextOps.MinhashA.length}], got $n")
        TextHash.MinhashSig(hv, TextOps.MinhashA.take(n).toSeq,
          TextOps.MinhashB.take(n).toSeq, TextOps.HashMod)
      }),
    (FunctionIdentifier("graft_bpe_token_count"),
      info("graft_bpe_token_count",
        "graft_bpe_token_count(text) - token count under the GPT-2-style " +
          "pre-tokenizer regex (the library's est-token metric)"),
      (args: Seq[Expression]) => args match {
        // the same regexp_count(text, BpeTokenRe)::long as
        // TextOps.bpeTokenCount, built as a Catalyst tree (a Column
        // bridged inside a builder stays unresolved)
        case Seq(t) => Cast(
          org.apache.spark.sql.catalyst.expressions.RegExpCount(
            t, Literal(TextOps.BpeTokenRe)), LongType)
        case _ => wrongArgs("graft_bpe_token_count", "1", args.length)
      }),
    (FunctionIdentifier("graft_bpe_merge_count"),
      info("graft_bpe_merge_count",
        "graft_bpe_merge_count(text) - EXACT merge-table BPE token count " +
          "(greedy lowest-rank merges over GPT-2-style pre-tokens against " +
          "the library's built-in merge table)"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => graft.functions.BpeMerge.BpeMergeCount(t,
          TextOps.DefaultBpeMerges, TextOps.BpeTokenRe)
        case _ => wrongArgs("graft_bpe_merge_count", "1", args.length)
      }),
    (FunctionIdentifier("graft_warc_records"),
      info("graft_warc_records",
        "graft_warc_records(blob) - split a WARC archive (string or " +
          "binary) into records by Content-Length framing; " +
          "array<struct<warc_type, uri, content_length, payload>>, " +
          "lenient on truncated tails"),
      (args: Seq[Expression]) => args match {
        case Seq(b) => graft.functions.WarcParse.WarcRecords(b)
        case _ => wrongArgs("graft_warc_records", "1", args.length)
      }),
    (FunctionIdentifier("graft_gzip"),
      info("graft_gzip",
        "graft_gzip(binary) - compress as one gzip member"),
      (args: Seq[Expression]) => args match {
        case Seq(b) => graft.functions.Gzip.GzipCompress(b)
        case _ => wrongArgs("graft_gzip", "1", args.length)
      }),
    (FunctionIdentifier("graft_gunzip"),
      info("graft_gunzip",
        "graft_gunzip(binary) - decompress a gzip stream (concatenated " +
          "members read as one, the .warc.gz layout); null on corrupt " +
          "or truncated input"),
      (args: Seq[Expression]) => args match {
        case Seq(b) => graft.functions.Gzip.Gunzip(b)
        case _ => wrongArgs("graft_gunzip", "1", args.length)
      }),
    (FunctionIdentifier("graft_tps_eval"),
      info("graft_tps_eval",
        "graft_tps_eval(px, py, ax, ay, theta) - evaluate a fitted " +
          "thin-plate-spline map (anchor arrays + weights theta of length " +
          "n+3) at point (px, py)"),
      (args: Seq[Expression]) => args match {
        case Seq(px, py, ax, ay, theta) => TpsEval(px, py, ax, ay, theta)
        case _ => wrongArgs("graft_tps_eval", "5", args.length)
      }))

  /** Register every graft function on a live session (idempotent —
    * re-registration overwrites with the identical builder). */
  def install(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
