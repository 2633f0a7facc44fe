package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.multimodal.MultimodalOps

/** Streaming IMAGE near-duplicate detection at ingest — the image twin
  * of [[DedupStream]]: the batch pipeline pairs a finished corpus
  * ([[MultimodalOps.imageNearDupPairs]]); ingest wants "which accepted
  * images does this NEW one collide with?" as media arrives. The aHash
  * and its band split are row-local (stream-legal as-is); the bucket
  * state — accepted (media_id, ahash) members per (band_id, band_bits)
  * — lives in `flatMapGroupsWithState`, each incoming image emits a
  * pair per stored member within `maxHamming` (exact full-hash
  * distance, the batch verify), then joins the bucket.
  *
  * Same parity/cap contract as the text twin: for bucket sizes under
  * the cap, the DISTINCT pair set over any stream prefix equals the
  * batch pairs on that prefix (a pair sharing several bands emits once
  * per shared band — batch distincts); at the cap the stream keeps the
  * FIRST-ARRIVED members (the batch rank-by-id rule is unreachable
  * without future knowledge), with the bounded overflow-recency buffer
  * guarding against at-least-once re-delivery re-emission. State per
  * key is capped — the low-entropy all-light band (the image
  * boilerplate band) stops growing instead of going quadratic. */
object ImageDedupStream {

  case class BandedImg(bandId: Int, bandBits: String, id: Long, ahash: String)
  case class ImgBucketState(ids: Array[Long], hashes: Array[String],
                            overflow: Array[Long])
  case class ImgPair(id_a: Long, id_b: Long, hamming: Long)

  /** Stateless per-row hashing + banding (shared with the spec). */
  def banded(media: DataFrame, grid: Int = 8,
             bands: Int = 8): Dataset[BandedImg] = {
    import media.sparkSession.implicits._
    val nBits = grid * grid
    require(bands >= 1 && nBits % bands == 0,
      s"bands must divide $nBits, got $bands")
    val bandLen = nBits / bands
    MultimodalOps.imageAHash(media, grid)
      .select(col("media_id").as("id"), col("ahash"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("bandId"),
            substring(col("ahash"), b * bandLen + 1, bandLen)
              .as("bandBits"))): _*)).as("_b"))
      .select(col("_b.bandId"), col("_b.bandBits"), col("id"), col("ahash"))
      .as[BandedImg]
  }

  def candidatesStream(media: DataFrame, grid: Int = 8, bands: Int = 8,
                       maxHamming: Int = 7,
                       maxBucket: Int = 100): Dataset[ImgPair] = {
    import media.sparkSession.implicits._
    banded(media, grid, bands)
      .groupByKey(b => (b.bandId, b.bandBits))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), it: Iterator[BandedImg],
         state: GroupState[ImgBucketState]) => {
          val prev = state.getOption.getOrElse(
            ImgBucketState(Array.empty, Array.empty, Array.empty))
          var ids = prev.ids
          var hashes = prev.hashes
          var overflow = prev.overflow
          val incoming = it.toArray.sortBy(_.id)
          val out = Seq.newBuilder[ImgPair]
          for (b <- incoming
               if !ids.contains(b.id) && !overflow.contains(b.id)) {
            var i = 0
            while (i < ids.length) {
              var d = 0; var j = 0
              val h = hashes(i)
              while (j < h.length) {
                if (h.charAt(j) != b.ahash.charAt(j)) d += 1
                j += 1
              }
              if (d <= maxHamming)
                out += ImgPair(math.min(ids(i), b.id),
                  math.max(ids(i), b.id), d.toLong)
              i += 1
            }
            if (ids.length < maxBucket) {
              ids = ids :+ b.id
              hashes = hashes :+ b.ahash
            } else {
              overflow = (overflow :+ b.id).takeRight(maxBucket)
            }
          }
          state.update(ImgBucketState(ids, hashes, overflow))
          out.result().iterator
        })
  }
}
