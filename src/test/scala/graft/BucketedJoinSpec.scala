package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB fact-fact join strategy:
  * both sides pre-bucketed on the join key means the sort-merge join
  * reads matching buckets directly, with NO shuffle exchange at query
  * time. Asserted at the physical-plan level.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact tables join with no exchange") {
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the sort-merge path (a broadcast would hide the bucketing).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum == 1500L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      // The join itself must not introduce a shuffle: the only exchange
      // allowed in the plan is the one for the final groupBy.
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
        !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles: ${joinPart.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
