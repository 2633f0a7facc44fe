package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew levers for joins and layouts — the two tools SCALE.md
  * promises for hot keys beyond AQE's runtime skew splitting.
  *
  * Salted equi-join: when the FACT side has hot keys (one session/doc/
  * cell holding a large fraction of rows), a plain equi-join sends every
  * hot-key row to one reducer. Salting splits each key into `salts`
  * sub-keys: the fact side gets a DETERMINISTIC salt from an existing
  * unique column (md5-derived — never `rand()`: retries and speculative
  * tasks must re-derive the same salt), the dim side replicates ×salts
  * via a literal explode. The join key becomes (key, salt) — hot keys
  * fan out over `salts` reducers, the dim replication is bounded by
  * |dim|·salts rows of the SMALL side. Result is bit-identical to the
  * unsalted join (spec-proven).
  *
  * Bucketed layout: for repeated joins/aggregations on one key, persist
  * both sides bucketed (`bucketBy` + sorted) so the join plans with ZERO
  * exchanges — co-location is decided at write time, not per query. See
  * [[BucketedLayout]].
  */
object SkewOps {

  /** Deterministic salt in [0, salts): 60-bit md5 of (saltSeed ++ id),
    * mod salts — same engine-portable hash family as SampleOps. */
  def saltOf(idCol: Column, salts: Int, saltSeed: String = "skew"): Column =
    pmod(TextOps.hash60(concat(lit(saltSeed), idCol.cast("string"))),
      lit(salts.toLong)).cast("int")

  /** Inner equi-join of a skewed fact table against a small dim table on
    * `key`, salted ×`salts`. `factIdCol` must be unique per fact row (any
    * primary key — only determinism matters, not uniqueness of the salt).
    * The dim side is broadcast when small enough (Spark's own estimate);
    * salting additionally protects the shuffle path when it is not. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factIdCol: String, salts: Int = 8,
                 saltSeed: String = "skew"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salt = freshName("_salt", fact.columns ++ dim.columns)
    val saltedFact = fact.withColumn(salt,
      saltOf(col(factIdCol), salts, saltSeed))
    val saltedDim = dim
      .withColumn(salt, explode(sequence(lit(0), lit(salts - 1))))
      .withColumn(salt, col(salt).cast("int"))
    saltedFact.join(saltedDim, Seq(key, salt)).drop(salt)
  }

  /** Working-column name guaranteed absent from `existing` — a caller
    * column literally named `_salt` must survive the join untouched. */
  private def freshName(base: String, existing: Seq[String]): String = {
    var c = base
    while (existing.contains(c)) c += "_"
    c
  }

  /** Salted two-phase aggregation: count/sum-like partial aggregation is
    * already map-side combined by Spark, but HIGH-CARDINALITY state per
    * key (collect_list, exact distinct) concentrates on one reducer per
    * key. Phase 1 aggregates per (key, salt); phase 2 merges the ≤
    * `salts` partials per key. `partial` and `merge` must form a
    * decomposable pair (merge ∘ partial ≡ direct). */
  def saltedAgg(df: DataFrame, key: String, idCol: String,
                partial: Seq[Column], merge: Seq[Column],
                salts: Int = 8, saltSeed: String = "skew"): DataFrame = {
    val salt = freshName("_salt", df.columns)
    df.withColumn(salt, saltOf(col(idCol), salts, saltSeed))
      .groupBy(col(key), col(salt)).agg(partial.head, partial.tail: _*)
      .groupBy(col(key)).agg(merge.head, merge.tail: _*)
  }
}
