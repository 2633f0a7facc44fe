package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the HTML link-extraction chain
  * ([[graft.operators.HtmlOps.extractLinks]]) — the r17 optimization
  * pass's application of the ShingleHash60 discipline to the web tier.
  *
  * The declarative formulation evaluated three `regexp_extract`s per
  * anchor segment inside an interpreted `transform` lambda, plus a
  * per-anchor RFC-3986 resolution whose dot-segment fold was an
  * interpreted `aggregate` HOF — tens of interpreted expression evals
  * per anchor per page. These kernels do the identical work in one
  * `eval` per page (anchor scan) / per anchor (URL resolution) with
  * precompiled patterns and tight JVM loops.
  *
  * Bit-parity contract (HtmlOpsSpec + the closed-form web oracles): the
  * patterns are the column chain's patterns VERBATIM, applied through
  * the same java.util.regex engine Spark's regexp functions use —
  * `split` with limit −1, `rlike` ≡ `find()`, `regexp_extract` ≡ first
  * match's group or "" (unmatched optional group → ""), `regexp_replace`
  * ≡ `replaceAll`. Any deviation breaks the frontier/link-graph oracle
  * hashes, which state every resolution branch in closed form.
  */
object HtmlKernels {

  // ---- anchor scan: stripNonContent → split at <a → per-segment hrefs

  private val ScriptAt = Pattern.compile("(?i)(?=<script\\b)")
  private val ScriptOpen = Pattern.compile("(?i)^<script\\b")
  private val ScriptElem =
    Pattern.compile("(?is)^<script\\b[^>]*>.*?</script\\s*>")
  private val StyleAt = Pattern.compile("(?i)(?=<style\\b)")
  private val StyleOpen = Pattern.compile("(?i)^<style\\b")
  private val StyleElem =
    Pattern.compile("(?is)^<style\\b[^>]*>.*?</style\\s*>")
  private val CommentAt = Pattern.compile("(?=<!--)")
  private val CommentOpen = Pattern.compile("^<!--")
  private val CommentElem = Pattern.compile("(?s)^<!--.*?-->")
  private val AnchorAt = Pattern.compile("(?i)(?=<a\\b)")
  private val HrefDq = Pattern.compile(
    "(?is)^<a\\b[^>]*?(?<![\\w-])href\\s*=\\s*\"([^\"]*)\"")
  private val HrefSq = Pattern.compile(
    "(?is)^<a\\b[^>]*?(?<![\\w-])href\\s*=\\s*'([^']*)'")
  private val AnchorElem = Pattern.compile("(?is)^(<a\\b[^>]*>.*?</a\\s*>)")

  /** One [[graft.operators.HtmlOps]] `stripSpansLinear` pass: split at
    * the opener lookahead, ^-anchored close per segment; unclosed spans
    * swallow to end of document. */
  private def stripPass(s: String, at: Pattern, open: Pattern,
                        elem: Pattern): String = {
    val segs = at.split(s, -1)
    if (segs.length == 1) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (!open.matcher(seg).find()) sb.append(seg)
      else if (elem.matcher(seg).find())
        sb.append(elem.matcher(seg).replaceAll(" "))
      else sb.append(' ')
      i += 1
    }
    sb.toString
  }

  private[graft] def stripNonContent(html: String): String = {
    val noScript = stripPass(html, ScriptAt, ScriptOpen, ScriptElem)
    val noStyle = stripPass(noScript, StyleAt, StyleOpen, StyleElem)
    stripPass(noStyle, CommentAt, CommentOpen, CommentElem)
  }

  private val anchorSchema = StructType(Seq(
    StructField("dq", StringType, nullable = false),
    StructField("sq", StringType, nullable = false),
    StructField("elem", StringType, nullable = false)))

  /** array<struct<dq, sq, elem>> of the page's closed anchor elements in
    * document order — exactly the `_elems` array of the pre-r17 HOF
    * chain (script/style/comment regions removed first; unclosed
    * anchors yield no entry; nested `<a` resolves innermost). */
  case class AnchorScan(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(anchorSchema, containsNull = false)

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"anchor_scan needs a string arg, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any = {
      val html = input.asInstanceOf[UTF8String].toString
      val segs = AnchorAt.split(stripNonContent(html), -1)
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < segs.length) {
        val seg = segs(i)
        val em = AnchorElem.matcher(seg)
        if (em.find()) {
          val dm = HrefDq.matcher(seg)
          val sm = HrefSq.matcher(seg)
          out += InternalRow(
            UTF8String.fromString(if (dm.find()) dm.group(1) else ""),
            UTF8String.fromString(if (sm.find()) sm.group(1) else ""),
            UTF8String.fromString(em.group(1)))
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): AnchorScan =
      copy(child = c)
  }

  def anchor_scan(html: Column): Column =
    Bridge.column(AnchorScan(Bridge.expression(html)))

  // ---- RFC-3986-lite reference resolution (HtmlOps.resolveUrl parity)

  private val AbsRx = Pattern.compile("(?i)^[a-z][a-z0-9+.-]*://")
  private val OtherSchemeRx = Pattern.compile("(?i)^[a-z][a-z0-9+.-]*:")
  private val BaseSchemeRx = Pattern.compile("^([a-z][a-z0-9+.-]*):")
  private val HostRootRx = Pattern.compile("^([a-z][a-z0-9+.-]*://[^/?#]+)")
  private val BasePathRx =
    Pattern.compile("^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?")
  private val LastSegRx = Pattern.compile("[^/]*$")
  private val SuffixRx = Pattern.compile("([?#].*)$")
  private val DirLikeRx = Pattern.compile("(?:/|/\\.|/\\.\\.)$")

  private def group1OrEmpty(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** The resolution itself, null = non-hierarchical/fragment/empty (the
    * when-chain's null branch). Shared with the test surface. */
  private[graft] def resolve(base: String, href: String): String = {
    if (AbsRx.matcher(href).find()) return href
    if (href.startsWith("//")) // proto-relative: base scheme + ":" + href
      return group1OrEmpty(BaseSchemeRx, base) + ":" + href
    if (href.startsWith("#") || href.isEmpty ||
      OtherSchemeRx.matcher(href).find()) return null
    val hostRoot = group1OrEmpty(HostRootRx, base)
    val basePath = group1OrEmpty(BasePathRx, base)
    val suffix = group1OrEmpty(SuffixRx, href)
    val hrefPath = {
      val m = SuffixRx.matcher(href)
      if (m.find()) href.substring(0, m.start()) else href
    }
    if (hrefPath.isEmpty) // query-only self link keeps the base's FULL path
      return hostRoot + (if (basePath.isEmpty) "/" else basePath) + suffix
    val baseDir =
      if (basePath.isEmpty) "/"
      else LastSegRx.matcher(basePath).replaceAll("")
    val joined = if (hrefPath.startsWith("/")) hrefPath else baseDir + hrefPath
    val segs = joined.split("/", -1)
    val folded = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var i = 0
    while (i < segs.length) {
      val x = segs(i)
      if (x.isEmpty || x == ".") ()
      else if (x == "..") { if (folded.nonEmpty) folded.remove(folded.length - 1) }
      else folded += x
      i += 1
    }
    val dirLike = DirLikeRx.matcher(joined).find()
    val normPath =
      if (dirLike && folded.nonEmpty) "/" + folded.mkString("/") + "/"
      else "/" + folded.mkString("/")
    hostRoot + normPath + suffix
  }

  /** `url_resolve(base, href)` — null-branch parity with the when-chain:
    * an ABSOLUTE href resolves even under a null base (the chain's
    * `when(isAbs, href)` never reads the base); every other branch
    * yields null when either input is null. */
  case class UrlResolve(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"url_resolve needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

    override def eval(input: InternalRow): Any = {
      val hrefU = right.eval(input)
      if (hrefU == null) return null
      val href = hrefU.asInstanceOf[UTF8String].toString
      if (AbsRx.matcher(href).find()) return UTF8String.fromString(href)
      if (href.startsWith("#") || href.isEmpty ||
        (OtherSchemeRx.matcher(href).find() && !href.startsWith("//")))
        return null
      val baseU = left.eval(input)
      if (baseU == null) return null
      val r = resolve(baseU.asInstanceOf[UTF8String].toString, href)
      if (r == null) null else UTF8String.fromString(r)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): UrlResolve = copy(left = l, right = r)
  }

  def url_resolve(base: Column, href: Column): Column =
    Bridge.column(UrlResolve(Bridge.expression(base), Bridge.expression(href)))
}
