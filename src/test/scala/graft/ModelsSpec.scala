package graft

import graft.core.Models
import graft.operators.Reports

/** O16 — typed result decoding via Dataset encoders. */
class ModelsSpec extends SparkSpec {

  private lazy val events =
    graft.core.Tables.read(spark, "/root/testdata/sf0.001", "events")

  test("daily counts decode to Dataset[DailyCount]") {
    val ds = Models.asDailyCounts(Reports.dailyCount(events, "ts"))
    val first = ds.head()
    assert(first.d.toString === "2024-01-01")
    assert(first.cnt > 0)
    assert(ds.count() === 30)
  }

  test("grouped counts decode to Dataset[GroupCount]") {
    val ds = Models.asGroupCounts(Reports.dailyGroupCount(
      events, "ts", "user_id", "event_type",
      distinct = true, ascending = false))
    assert(ds.head().grp.nonEmpty)
  }

  test("daily averages decode with field-suffix normalization") {
    val ds = Models.asDailyAverages(
      Reports.dailyAverage(events, "ts", "value"), "value")
    val first = ds.head()
    assert(first.cnt > 0 && first.sum > first.avg)
  }
}
