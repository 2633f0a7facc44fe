package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = (1 to 500).map(i => (i.toLong, s"c${i % 40}", i * 1.5))
    .toDF("o_id", "cust", "amount")
  lazy val items = (1 to 2000).map(i => ((i % 500 + 1).toLong, s"p${i % 17}", i))
    .toDF("o_id", "part", "qty")

  test("bucketed-by-key tables join with zero exchanges and equal results") {
    BucketedLayout.writeBucketed(orders, "b_orders", "o_id", buckets = 8)
    BucketedLayout.writeBucketed(items, "b_items", "o_id", buckets = 8)
    // disable broadcast so the test exercises the shuffle path the
    // bucketing exists to eliminate (at real fact×fact sizes neither
    // side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedLayout.coLocatedJoin(spark, "b_orders", "b_items", "o_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan lost:\n$plan")
      // (a task-local Sort stays in the plan: Spark only elides it for
      // single-file buckets; it is a cheap in-memory pass over an
      // already-sorted run, not a shuffle)
      // correctness: same rows as the plain join
      val plain = orders.join(items, "o_id")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).count() == 0 &&
        plain.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    BucketedLayout.writeBucketed(items, "b_items_agg", "o_id", buckets = 8)
    val agg = BucketedLayout.table(spark, "b_items_agg")
      .groupBy("o_id").agg(sum("qty").as("total"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed agg still shuffles:\n$plan")
    val direct = items.groupBy("o_id").agg(sum("qty").as("total"))
    assert(agg.exceptAll(direct).count() == 0 &&
      direct.exceptAll(agg).count() == 0)
    spark.sql("DROP TABLE IF EXISTS b_items_agg")
  }
}
