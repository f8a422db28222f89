package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Plan-mechanical proof of the co-located join: two tables bucketed on
  * the join key by the same bucket count sort-merge-join with zero
  * exchanges. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with zero exchanges") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "orders")
          .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice")),
        "orders_bkt", "custkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "customer")
          .select(col("c_custkey").as("custkey"), col("c_name")),
        "customer_bkt", "custkey", buckets = 8)
      val joined = Bucketing.colocatedJoin(spark, "orders_bkt", "customer_bkt", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it computes the same result as the plain join
      val expected = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
