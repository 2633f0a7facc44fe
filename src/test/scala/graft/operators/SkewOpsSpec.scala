package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed fact: key "hot" holds 90% of rows; dim: one row per key
  lazy val fact = (1 to 1000).map { i =>
    (i.toLong, if (i <= 900) "hot" else s"k${i % 7}", i * 2.0)
  }.toDF("row_id", "key", "v")
  lazy val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i * 100) }.toDF("key", "dim_v")

  def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double, Int)] =
    df.select("row_id", "key", "v", "dim_v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("salted join is bit-identical to the plain join") {
    val plain = canon(fact.join(dim, "key"))
    val salted = canon(SkewOps.saltedJoin(fact, dim, "key", "row_id",
      salts = 8))
    assert(salted == plain && plain.size == 1000)
  }

  test("salt is deterministic and spreads the hot key across sub-keys") {
    val salts = fact.filter(col("key") === "hot")
      .select(SkewOps.saltOf(col("row_id"), 8).as("s"))
    val dist = salts.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist.keySet.size == 8, s"hot key not spread: $dist")
    // deterministic: recompute matches
    val again = fact.filter(col("key") === "hot")
      .select(SkewOps.saltOf(col("row_id"), 8).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == dist)
    // no sub-bucket holds more than half the hot rows (md5 spreads)
    assert(dist.values.max <= 450, s"salt skewed: $dist")
  }

  test("salted join replicates only the dim side, and only ×salts") {
    val joined = SkewOps.saltedJoin(fact, dim, "key", "row_id", salts = 4)
    // count materialization: every fact row appears exactly once
    assert(joined.count() == 1000)
    assert(joined.groupBy("row_id").count()
      .filter(col("count") =!= 1).count() == 0)
  }

  test("saltedAgg merges partials to the exact unsalted result") {
    val direct = fact.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toMap
    val salted = SkewOps.saltedAgg(fact, "key", "row_id",
        partial = Seq(count(lit(1)).as("pn"), sum("v").as("psv")),
        merge = Seq(sum("pn").as("n"), sum("psv").as("sv")))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toMap
    assert(salted == direct)
  }
}
