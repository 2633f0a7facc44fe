package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text / document operators for large-scale training-data pipelines.
  *
  * Engine-portability rule (shared with the DuckDB oracles): every hash is
  * derived from md5 hex strings — identical bytes-in/hex-out on any engine —
  * never from engine-native hash functions. Numeric hashes take the first
  * 15 hex chars (60 bits) so they fit a signed 64-bit integer in any SQL
  * dialect.
  *
  * Scale shapes:
  *  - minhash signatures are per-row higher-order-function folds — no
  *    explode, no shuffle until the band join;
  *  - LSH candidate generation shuffles once on (band_id, band_hash);
  *    hot bands (boilerplate shingles) are the skew axis — salt or cap
  *    bucket sizes at 100 TB;
  *  - simhash is one explode + one partial-aggregated groupBy per doc.
  */
object TextOps {

  val HashMod = 1000000007L

  def tokens(text: Column): Column = split(trim(text), " ")

  /** Distinct word k-shingles, empty when the doc has < k tokens. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: for seed i, min over shingles of md5("i|" + s)
    * (lexicographic min of hex strings — engine-portable). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleCol,
        s => md5(concat(lit(s"$i|"), s).cast("binary"))))): _*)

  /** LSH band hashes: md5 of the concatenated signature rows per band. */
  def lshBands(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      md5(concat((0 until rowsPerBand).map(r =>
        element_at(sigCol, b * rowsPerBand + r + 1)): _*).cast("binary"))): _*)

  /** MinHash+LSH near-duplicate candidates: docs sharing at least one band,
    * with the signature-estimated Jaccard. One shuffle on the band hash,
    * pair dedup via distinct. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      minEstJaccard: Double = 0.25): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = docs
      .select(col(idCol).as("doc"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc"), minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = withSig.select(col("doc"), col("sig"),
      posexplode(lshBands(col("sig"), bands, rowsPerBand)).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x))
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact n-gram Jaccard similarity for all pairs above a threshold:
    * explode shingles → equi-join on the shingle → pair intersection counts
    * → join per-doc set sizes → |A∩B| / (|A|+|B|−|A∩B|). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, minJaccard: Double = 0.2): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), explode(shingles(col(textCol), shingleK)).as("s"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val common = sh.select(col("doc").as("doc_a"), col("s"))
      .join(sh.select(col("doc").as("doc_b"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 60-bit numeric hash of a string via md5 prefix (engine-portable). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** SimHash (60-bit): per token, ±1 vote on each bit of hash60(token);
    * simhash bit j set iff the vote sum is positive. One explode + one
    * groupBy with 60 declarative sums (map-side combined). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("w"))
      .withColumn("h", hash60(col("w")))
    val bitSums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
    val agg = tok.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc"), sh.as("simhash"))
  }

  /** Document fingerprint: min over 4-token k-gram rolling hashes
    * (winnowing-style shingle-min; null for docs with < 4 tokens). */
  def fingerprint(text: Column): Column = {
    val toks = tokens(text)
    val hs = transform(toks, w => pmod(hash60(w), lit(HashMod)))
    val n = size(hs)
    val grams = transform(sequence(lit(1), greatest(n - 3, lit(1))), i =>
      pmod(pmod(pmod(element_at(hs, i) * 31 + element_at(hs, i + 1), lit(HashMod))
        * 31 + element_at(hs, i + 2), lit(HashMod))
        * 31 + element_at(hs, i + 3), lit(HashMod)))
    when(n >= 4, array_min(grams)).otherwise(lit(null).cast("long"))
  }

  /** Language-ID by stopword-marker voting with a deterministic argmax
    * (de > en > es > fr priority on ties). Heuristic n-gram language ID
    * at training-data-pipeline quality. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def score(ws: Seq[String]): Column =
      size(filter(toks, w => ws.map(m => w === m).reduce(_ || _))).cast("long")
    val scored = docs.select(col(idCol).as("doc"),
      score(langMarkers("de")).as("s_de"), score(langMarkers("en")).as("s_en"),
      score(langMarkers("es")).as("s_es"), score(langMarkers("fr")).as("s_fr"))
    scored.withColumn("lang_pred",
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
        col("s_de") >= col("s_fr"), "de")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
  }

  /** Quality heuristics: char/word counts, mean word length, long-word and
    * stopword ratios, est. LLM tokens (chars/4 rule), plus a composite
    * keep/drop score in [0,1]. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = trim(col(textCol))
    val toks = tokens(col(textCol))
    val nChars = length(t).cast("long")
    val nWords = size(toks).cast("long")
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val stopRatio = size(filter(toks, w => stop.map(m => w === m).reduce(_ || _)))
      .cast("double") / size(toks)
    val longRatio = size(filter(toks, w => length(w) > 6)).cast("double") / size(toks)
    val meanLen = nChars.cast("double") / nWords
    docs.select(col(idCol).as("doc"),
      nChars.as("n_chars"), nWords.as("n_words"),
      ceil(nChars.cast("double") / 4.0).cast("long").as("est_tokens"),
      meanLen.as("mean_word_len"),
      stopRatio.as("stopword_ratio"),
      longRatio.as("long_word_ratio"),
      // composite: favor mid-length docs with some stopwords, few long words
      (lit(1.0)
        - when(stopRatio < 0.02, 0.4).otherwise(0.0)
        - when(nWords < 5, 0.4).otherwise(0.0)
        - when(longRatio > 0.5, 0.2).otherwise(0.0)).as("quality"))
  }
}
