package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics for the quality/langid column family —
  * `quality_stats(text)` returns
  * struct<n_chars, n_words, n_stop, n_long, s_de, s_en, s_es, s_fr>.
  *
  * Every field replicates the declarative chain bit-for-bit:
  * tokens = `split(trim(text), " ")` (Spark trim strips 0x20 ONLY; Java
  * split limit −1 keeps empty tokens — "a  b" has THREE tokens, one
  * empty), `length()` counts CODEPOINTS (UTF8String.numChars), stopword
  * and language-marker hits are exact string equality against the shared
  * [[graft.operators.TextOps.QualityStopwords]] / langMarkers sets.
  *
  * The declarative forms (`size(filter(tokens(t), …))` per statistic)
  * re-evaluated the split inside every interpreted HOF lambda — five to
  * nine passes over every document per consuming projection, and the
  * quality gate's pushed-down filter re-derived the whole chain once
  * more per row. Consumers rebuild the SAME when-chains over this
  * struct's fields, so null propagation is unchanged. */
object QualityStats {

  private val stopwords: Array[String] =
    graft.operators.TextOps.QualityStopwords.toArray
  private val deM: Array[String] =
    graft.operators.TextOps.langMarkers("de").toArray
  private val enM: Array[String] =
    graft.operators.TextOps.langMarkers("en").toArray
  private val esM: Array[String] =
    graft.operators.TextOps.langMarkers("es").toArray
  private val frM: Array[String] =
    graft.operators.TextOps.langMarkers("fr").toArray

  private val schema = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_long", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false)))

  case class QualityStatsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = schema

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quality_stats needs a string arg, got ${child.dataType.simpleString}")

    private def hits(tok: String, set: Array[String]): Int = {
      var i = 0
      while (i < set.length) {
        if (set(i) == tok) return 1
        i += 1
      }
      0
    }

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      // Spark trim(): strip 0x20 only (never \t/\n — String.trim would)
      var lo = 0
      var hi = text.length
      while (lo < hi && text.charAt(lo) == ' ') lo += 1
      while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
      val t = text.substring(lo, hi)
      val nChars = t.codePointCount(0, t.length)
      val toks = t.split(" ", -1)
      var nStop = 0; var nLong = 0
      var de = 0; var en = 0; var es = 0; var fr = 0
      var i = 0
      while (i < toks.length) {
        val w = toks(i)
        nStop += hits(w, stopwords)
        if (w.codePointCount(0, w.length) > 6) nLong += 1
        de += hits(w, deM); en += hits(w, enM)
        es += hits(w, esM); fr += hits(w, frM)
        i += 1
      }
      InternalRow(nChars, toks.length, nStop, nLong, de, en, es, fr)
    }

    override protected def withNewChildInternal(c: Expression): QualityStatsExpr =
      copy(child = c)
  }

  def quality_stats(text: Column): Column =
    Bridge.column(QualityStatsExpr(Bridge.expression(text)))
}
