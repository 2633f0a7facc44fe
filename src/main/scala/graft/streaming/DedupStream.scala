package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** Streaming MinHash/LSH near-duplicate detection at ingest.
  *
  * The batch pipeline dedups a corpus after the fact
  * ([[TextOps.minhashLshPairs]]); a production ingest wants the mirror
  * image — "which already-accepted documents does this NEW one collide
  * with?" as documents arrive. Same LSH layout as batch (shingle-hash →
  * minhash signature → band keys, all through the native kernels, computed
  * statelessly per row), then `flatMapGroupsWithState` keyed by
  * `(band_id, band_hash)`: the state is the bucket's accepted (doc, sig)
  * members, each incoming doc emits a candidate pair per stored member
  * whose signature agreement clears `minEstJaccard`, and is then appended
  * to the bucket.
  *
  * Parity with batch: for bucket sizes under the cap, the DISTINCT pair
  * set emitted over any prefix of the stream equals
  * `minhashLshPairs(prefix)` (a pair sharing several bands emits once per
  * shared band — batch `distinct`s those; dedup downstream if exact-once
  * matters). Divergence: the bucket cap keeps the FIRST-ARRIVED `maxBucket`
  * members (the stream cannot know about future smaller doc ids, so the
  * batch rank-by-id rule is unreachable); overflow docs still emit pairs
  * against the stored members but are not added. Overflow doc ids ARE
  * remembered in a bounded recency buffer (the most recent `maxBucket` per
  * bucket) so an at-least-once source re-delivering a recent overflow doc
  * does not re-emit its pairs; a re-delivery arriving after `maxBucket`
  * further overflows in the same bucket can still re-emit — downstream
  * consumers under at-least-once delivery must dedup pairs regardless.
  *
  * Scale: state per key is bounded by `maxBucket`; hot boilerplate bands
  * stop growing at the cap instead of going quadratic — the same skew
  * story as batch. Each micro-batch shuffles once on the band key.
  */
object DedupStream {

  case class Banded(bandId: Int, bandHash: Long, doc: Long, sig: Array[Long])
  /** sigs flattened row-major (numHashes per member) — keeps the state
    * encoder to flat primitive arrays. `overflow` is the bounded recency
    * buffer of doc ids that arrived after the cap (so re-deliveries are
    * recognized without storing their signatures). */
  case class BucketState(docs: Array[Long], sigsFlat: Array[Long],
                         overflow: Array[Long])
  case class CandPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Stateless per-row banding (shared by stream and its spec): one output
    * row per (doc, band). */
  def banded(docs: DataFrame, idCol: String, textCol: String,
             shingleK: Int, numHashes: Int, bands: Int): Dataset[Banded] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = numHashes / bands
    docs
      .select(col(idCol).cast("long").as("doc"),
        graft.functions.TextHash.shingle_hash60(
          col(textCol), shingleK, TextOps.HashMod).as("hv"))
      .filter(size(col("hv")) > 0)
      .select(col("doc"), graft.functions.TextHash.minhash_sig(col("hv"),
        TextOps.MinhashA.take(numHashes).toSeq,
        TextOps.MinhashB.take(numHashes).toSeq, TextOps.HashMod).as("sig"))
      .select(col("doc"), col("sig"),
        posexplode(TextOps.lshBands(col("sig"), bands, rowsPerBand))
          .as(Seq("band_id", "band_hash")))
      .select(col("band_id").as("bandId"), col("band_hash").as("bandHash"),
        col("doc"), col("sig"))
      .as[Banded]
  }

  def candidatesStream(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                       minEstJaccard: Double = 0.25,
                       maxBucket: Int = TextOps.DefaultMaxBandBucket): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    banded(docs, idCol, textCol, shingleK, numHashes, bands)
      .groupByKey(b => (b.bandId, b.bandHash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), it: Iterator[Banded], state: GroupState[BucketState]) => {
          val prev = state.getOption.getOrElse(
            BucketState(Array.empty, Array.empty, Array.empty))
          var docIds = prev.docs
          var sigs = prev.sigsFlat
          var overflow = prev.overflow
          // sort incoming by doc id: emission order (and which members a
          // same-batch pair counts against) is then arrival-order-free
          val incoming = it.toArray.sortBy(_.doc)
          val out = Seq.newBuilder[CandPair]
          for (b <- incoming
               if !docIds.contains(b.doc) && !overflow.contains(b.doc)) {
            val n = b.sig.length
            var i = 0
            while (i < docIds.length) {
              var eq = 0; var j = 0
              while (j < n) { if (sigs(i * n + j) == b.sig(j)) eq += 1; j += 1 }
              val est = eq.toDouble / n
              if (est >= minEstJaccard)
                out += CandPair(math.min(docIds(i), b.doc),
                  math.max(docIds(i), b.doc), est)
              i += 1
            }
            if (docIds.length < maxBucket) {
              docIds = docIds :+ b.doc
              sigs = sigs ++ b.sig
            } else {
              overflow = (overflow :+ b.doc).takeRight(maxBucket)
            }
          }
          state.update(BucketState(docIds, sigs, overflow))
          out.result().iterator
        })
  }
}
