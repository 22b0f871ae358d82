package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier-B relational surface, exercised as standing queries over the
  * TPC-H-ish driver tables (TESTDATA.md). The reference reaches this tier
  * through its raw-SQL console (ballcone/dao.py:344-352); here the same
  * capability is Spark SQL itself, and these pipelines are the regression
  * net proving joins/aggregates/windows plan well at scale.
  *
  * Scale design: dimension tables (region/nation/supplier) are
  * explicitly `broadcast()` so the big fact-side joins never shuffle the
  * fact table on a dimension key; Catalyst's AQE handles skew for the
  * fact-fact joins.
  */
object Relational {

  /** TPC-H Q1 pricing summary: one wide hash aggregate over lineitem —
    * the canonical partial/final (map-side combine) aggregation shape.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style shipping priority: selective dimension filter first,
    * then fact joins, then a top-k (TakeOrderedAndProject) — the plan
    * shape that survives a 100x scale-up because the filters prune before
    * the shuffles.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String): DataFrame =
    customer
      .filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > lit(cutoff).cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style local-supplier revenue: fact table joined against a
    * chain of broadcast dimensions; only the orders⨝lineitem join
    * shuffles.
    */
  def localSupplierRevenue(customer: DataFrame, orders: DataFrame,
                           lineitem: DataFrame, supplier: DataFrame,
                           nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Top spenders: orders⨝customer rollup with a deterministic top-k. */
  def topCustomers(customer: DataFrame, orders: DataFrame, n: Int): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(n)
}
