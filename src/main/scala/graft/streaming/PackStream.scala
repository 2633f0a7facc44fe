package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing AT INGEST — the streaming twin of
  * [[graft.operators.SampleOps.packChunks]]: documents are assigned their
  * (shard, chunk) slot as they arrive, so the packer's layout exists the
  * moment ingest ends instead of requiring a batch pass.
  *
  * The token count is a row-local projection (chars/4 default, or the
  * exact merge-BPE column — same `tokenCount` hook as batch); the ONLY
  * state is one Long per shard: the running token total. Each incoming
  * document reads its chunk as floor(cum / contextTokens) and advances
  * the cursor — per-shard sequential by construction, which is exactly
  * the batch window's `rowsBetween(unboundedPreceding, -1)` prefix sum.
  *
  * Parity: equals the batch layout row-for-row whenever ingest is
  * id-ordered per shard (append-ordered ingest; same contract as the
  * dedup/curation streams). Same-batch arrivals sort by doc id first, so
  * intra-batch arrival order never matters.
  */
object PackStream {

  def packChunksStream(docs: DataFrame, idCol: String, textCol: String,
                       contextTokens: Int = 2048, numShards: Int = 32,
                       tokenCount: Option[Column] = None): DataFrame = {
    val nTokens = tokenCount.getOrElse(
      ceil(length(trim(col(textCol))).cast("double") / 4.0).cast("long"))
    val base = docs.select(col(idCol).cast("long").as("doc"),
      pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("shard"),
      nTokens.cast("long").as("n_tokens"))
    val outSchema = StructType(Seq(
      StructField("doc", LongType), StructField("shard", LongType),
      StructField("n_tokens", LongType), StructField("chunk", LongType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    base.groupByKey(_.getLong(1))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Long, it: Iterator[Row], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          // id order within the micro-batch: arrival order never matters
          val rows = it.toArray.sortBy(_.getLong(0))
          val out = rows.map { r =>
            val n = r.getLong(2)
            // floor(cum/ctx): Long division — cum is non-negative, and the
            // batch form's double cast is exact below 2^53 tokens/shard
            val res = Row(r.getLong(0), shard, n, cum / contextTokens)
            cum += n
            res
          }
          state.update(cum)
          out.iterator
        })
  }
}
