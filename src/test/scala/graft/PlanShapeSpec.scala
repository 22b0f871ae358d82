package graft

/** Physical-plan shape assertions: the plans we designed for, not just
  * the first ones that passed (scale discipline — broadcasts where
  * dimensions are small, distributed top-k for sort+limit, partial
  * aggregation for the daily rollups).
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Queries.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5 joins every dimension with a broadcast, never a shuffle") {
    val p = plan("tpch_q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("sort+limit plans as distributed top-k (TakeOrderedAndProject)") {
    assert(plan("o08_select_range").contains("TakeOrderedAndProject"))
    assert(plan("tpch_q3_shipping").contains("TakeOrderedAndProject"))
  }

  test("daily aggregates use partial+final hash aggregation") {
    val p = plan("o10_daily_average")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("brute-force ANN broadcasts the query side") {
    val p = plan("sim_topk_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("scans prune columns: daily average reads only ts and value") {
    val p = plan("o10_daily_average")
    assert(p.contains("ReadSchema: struct<ts:bigint,value:double>"), p.take(2000))
  }
}
