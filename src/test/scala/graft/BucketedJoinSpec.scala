package graft

import org.apache.spark.sql.functions.col

/** Co-located joins from bucketed storage: pre-bucketing both fact
  * tables on the join key eliminates the shuffle entirely — at 100 TB
  * this turns the orders⨝lineitem join from the dominant network cost
  * into a local merge per bucket. (SURVEY §4.3 / the "minimize
  * shuffles" discipline.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    graft.core.Tables.read(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_orders_b")
    graft.core.Tables.read(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), // no shuffle, no broadcast
        "bucketed join still shuffles:\n" + plan.take(1500))
      // and it computes the right thing
      assert(joined.count() ===
        graft.core.Tables.read(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
