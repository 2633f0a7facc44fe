package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MinHash/LSH text-index persistence — build once, dedup many times.
  *
  * The expensive pass of LSH dedup at corpus scale is the
  * shingle→hash→signature scan over every document; the band table it
  * produces is tiny (one row per doc × band). Persisting that table as a
  * typed Parquet artifact lets every downstream consumer — candidate-pair
  * generation ([[TextOps.minhashPairsFromBands]]), pair→cluster connected
  * components ([[GraphOps.connectedComponents]]), audit queries — run
  * WITHOUT re-shingling the corpus. Same build/search discipline as the
  * ANN tier ([[AnnIndexIO]]) and the reference's model-artifact
  * persistence (calibration.py:675-690 saves fitted params as .npz and
  * reloads them downstream).
  *
  * Layout under `path/`: `bands/` — the `(doc, sig, band_id, band_hash)`
  * table, partitioned by `band_id` so a consumer probing one band layout
  * prunes the rest at the file-listing level. The signature column rides
  * along (a long array, numHashes entries) so pair verification needs no
  * join back to the corpus.
  */
object LshIndexIO {

  /** One full corpus pass: shingle → minhash → band keys, written as the
    * persisted band table. Returns the row count written — observed on the
    * write itself (`Dataset.observe`), NOT by re-reading the artifact: at
    * corpus scale a count-after-write doubles the file-listing cost of
    * every build. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4): Long = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    val table = TextOps.lshBandTable(docs, idCol, textCol, shingleK,
      numHashes, bands)
    val obs = Observation()
    table.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").partitionBy("band_id")
      .parquet(s"$path/bands")
    obs.get("rows").asInstanceOf[Long]
  }

  /** Load the persisted band table. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bands")

  /** Candidate pairs over the prebuilt index — bit-identical to the
    * inline [[TextOps.minhashLshPairs]] on the same corpus (spec-proven),
    * minus the full-corpus shingle pass. */
  def pairs(spark: SparkSession, path: String, numHashes: Int = 16,
            minEstJaccard: Double = 0.25,
            maxBandBucket: Option[Int] = Some(TextOps.DefaultMaxBandBucket)): DataFrame =
    TextOps.minhashPairsFromBands(load(spark, path), numHashes,
      minEstJaccard, maxBandBucket)

  /** Admit a new batch into the index (snapshot N → N+1): one shingle
    * pass over the BATCH only, appended under the existing band_id
    * partition dirs — the old corpus is never re-read, never rewritten.
    * Same row-count observation discipline as [[build]]. After an
    * [[append]], [[pairs]]/[[probe]] over the index see old ∪ new
    * exactly as a from-scratch [[build]] would (spec-proven). */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
             shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4): Long = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    val table = TextOps.lshBandTable(docs, idCol, textCol, shingleK,
      numHashes, bands)
    val obs = Observation()
    table.observe(obs, count(lit(1)).as("rows"))
      .write.mode("append").partitionBy("band_id")
      .parquet(s"$path/bands")
    obs.get("rows").asInstanceOf[Long]
  }

  /** Bucket-occupancy monitor for a built band index — the LSH tier's
    * [[AnnIndexIO.occupancyStats]]: one map-side-combined aggregate over
    * the band table. A healthy shingle distribution keeps buckets tiny;
    * boilerplate-heavy corpora (or drifted appends) pile docs into few
    * (band, hash) buckets, which first costs candidate recall (the
    * [[TextOps.DefaultMaxBandBucket]] rank cap starts truncating real
    * pairs) and then join cost (a hot bucket is quadratic in its kept
    * size). `capped_buckets` — buckets at or over the cap — is the
    * direct "the cap is binding, compact or re-shingle with a larger
    * k" signal; `max_occupancy`/`mean` is the skew early-warning.
    * Returns one row: `n_rows, n_buckets, mean_occupancy,
    * max_occupancy, skew, capped_buckets`. */
  def stats(spark: SparkSession, path: String,
            cap: Int = TextOps.DefaultMaxBandBucket): DataFrame = {
    import org.apache.spark.sql.functions._
    val perBucket = load(spark, path)
      .groupBy("band_id", "band_hash").agg(count(lit(1)).as("n"))
    // mean/skew derived from the exact integer aggregates (one division
    // each) so the oracle replay is bit-deterministic on any engine
    perBucket.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_occupancy"),
        sum(when(col("n") >= cap, 1L).otherwise(0L)).as("capped_buckets"))
      .select(col("n_rows"), col("n_buckets"),
        (round(col("n_rows").cast("double") /
          col("n_buckets").cast("double"), 6) + 0.0).as("mean_occupancy"),
        col("max_occupancy"),
        (round(col("max_occupancy").cast("double") *
          col("n_buckets").cast("double") /
          col("n_rows").cast("double"), 6) + 0.0).as("skew"),
        col("capped_buckets"))
  }

  /** Incremental dedup probe ([[TextOps.minhashProbePairs]]): candidate
    * pairs between a new batch and the persisted index (plus the batch's
    * internal pairs) WITHOUT re-pairing the indexed corpus against
    * itself — the admission decision for snapshot N+1 costs one batch
    * shingle pass + one band join against the index artifact. */
  def probe(spark: SparkSession, path: String, newDocs: DataFrame,
            idCol: String, textCol: String, shingleK: Int = 3,
            numHashes: Int = 16, bands: Int = 4,
            minEstJaccard: Double = 0.25,
            maxBandBucket: Option[Int] = Some(TextOps.DefaultMaxBandBucket)): DataFrame =
    TextOps.minhashProbePairs(load(spark, path),
      TextOps.lshBandTable(newDocs, idCol, textCol, shingleK, numHashes,
        bands),
      numHashes, minEstJaccard, maxBandBucket)
}
