package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.core.Entry
import graft.operators.{DateRange, Reports}
import org.apache.spark.sql.functions.col

/** Port of the reference's golden DAO unit tests — same 4-row fixture,
  * same expected values (reference: ballcone/test_dao.py:13-41 fixture,
  * :107-286 expectations; see FIXTURES.md §2).
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val fixture: DataFrame = Seq(
    Entry(ts("2020-01-01 12:00:00"), "example.com", "/", 200, 1024, 0.1,
      None, "192.168.1.1", Some("UNKNOWN"), Some("Mac OS"), Some("X 10.15"),
      Some("Firefox"), Some("75.0"), Some(false)),
    Entry(ts("2020-01-01 12:15:00"), "example.com", "/robots.txt", 404, 0, 0.01,
      None, "192.168.1.1", Some("UNKNOWN"), Some("Linux"), None,
      None, None, Some(true)),
    Entry(ts("2020-01-02 23:59:00"), "example.com", "/", 200, 256, 0.01,
      Some("https://github.com/dustalov"), "192.168.1.2", Some("UNKNOWN"),
      Some("iOS"), Some("13.3.1"), Some("Safari"), Some("13.0.5"), Some(false)),
    Entry(ts("2020-01-02 23:59:59"), "example.com", "/post", 200, 512, 1.0,
      None, "192.168.1.2", Some("UNKNOWN"), Some("iOS"), Some("13.3.1"),
      Some("Safari"), Some("13.0.5"), Some(false))
  ).toDF()

  // --- O9/O8: date-range select semantics incl. inclusive boundaries
  // (test_dao.py:107-125)

  test("date range: stop before data -> empty") {
    assert(fixture.filter(
      DateRange.pred(col("datetime"), None, Some("2019-12-31"))).count() === 0)
  }

  test("date range: stop on first day -> first two rows") {
    val rows = Reports.selectRange(fixture, "datetime", None,
      Some("2020-01-01"), 10).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Short]("status")).toSeq === Seq(200, 404))
  }

  test("date range: start == stop collapses to equality") {
    assert(fixture.filter(DateRange.pred(col("datetime"),
      Some("2020-01-01"), Some("2020-01-01"))).count() === 2)
  }

  test("date range: start on first day -> all rows") {
    assert(fixture.filter(DateRange.pred(col("datetime"),
      Some("2020-01-01"), None)).count() === 4)
  }

  test("date range: start on second day -> last two (23:59:59 inclusive)") {
    assert(fixture.filter(DateRange.pred(col("datetime"),
      Some("2020-01-02"), None)).count() === 2)
  }

  // --- O10: daily average goldens (test_dao.py:127-170)

  test("daily average of generation_time: avg 0.055 / 0.505") {
    val rows = Reports.dailyAverage(fixture, "datetime", "generation_time")
      .collect()
    assert(rows.length === 2)
    assert(math.abs(rows(0).getAs[Double]("avg_generation_time") - 0.055) < 1e-12)
    assert(math.abs(rows(0).getAs[Double]("sum_generation_time") - 0.11) < 1e-12)
    assert(rows(0).getAs[Long]("cnt_generation_time") === 2L)
    assert(math.abs(rows(1).getAs[Double]("avg_generation_time") - 0.505) < 1e-12)
    assert(rows(1).getAs[Long]("cnt_generation_time") === 2L)
  }

  // --- O11: daily counts (test_dao.py:172-225)

  test("daily visits: 2 per day; daily unique ip: 1 per day") {
    val visits = Reports.dailyCount(fixture, "datetime").collect()
    assert(visits.map(_.getAs[Long]("cnt")).toSeq === Seq(2L, 2L))
    val uniq = Reports.dailyCount(fixture, "datetime", Some("ip")).collect()
    assert(uniq.map(_.getAs[Long]("cnt")).toSeq === Seq(1L, 1L))
  }

  // --- O12: grouped counts (test_dao.py:227-286)

  test("grouped count by platform: (Linux,1),(Mac OS,1) then (iOS,2)") {
    val rows = Reports.dailyGroupCount(fixture, "datetime", "ip",
      "platform_name", distinct = false, ascending = true).collect()
    val got = rows.map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"))).toSeq
    assert(got === Seq(("Linux", 1L), ("Mac OS", 1L), ("iOS", 2L)))
  }

  // --- O13: top-N with group tiebreaker (dao.py:326)

  test("top-1 per day: tie broken by group name ascending") {
    val rows = Reports.topNPerDay(fixture, "datetime", "ip", "platform_name",
      distinct = false, ascending = false, n = 1).collect()
    val got = rows.map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"))).toSeq
    // day 1: Linux and Mac OS tie at 1 -> Linux wins by group order
    assert(got === Seq(("Linux", 1L), ("iOS", 2L)))
  }

  // --- O17: align-by-date merge (web_ballcone.py:66-73)

  test("align visits and unique series on day") {
    val merged = Reports.alignByDate(
      Reports.dailyCount(fixture, "datetime"),
      Reports.dailyCount(fixture, "datetime", Some("ip"))).collect()
    assert(merged.length === 2)
    assert(merged.map(r => (r.getAs[Long]("visits"), r.getAs[Long]("uniq"))).toSeq
      === Seq((2L, 1L), (2L, 1L)))
  }

  // --- O18: dashboard ordering (-count, name) (web_ballcone.py:36)

  test("dashboard: sorted by count desc then service name") {
    val rows = Reports.dashboard(fixture, "datetime", "platform_name", "ip",
      "2020-01-01").collect()
    val got = rows.map(r => (r.getAs[String]("service"), r.getAs[Long]("cnt"))).toSeq
    assert(got === Seq(("Linux", 1L), ("Mac OS", 1L)))
  }

  // --- anomaly/EWMA extensions of the daily series

  test("anomalyDays flags a planted 10x spike and nothing else") {
    // 14 flat days of 4 events, then one day of 40
    val rows = (1 to 14).flatMap { day =>
      (1 to 4).map(i => (ts(f"2020-01-$day%02d 10:0$i%01d:00"), i.toLong))
    } ++ (1 to 40).map(i => (ts("2020-01-15 10:00:00"), i.toLong))
    val df = rows.toDF("t", "user_id")
    val got = Reports.anomalyDays(df, "t", 7, 1.5).collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        r.getAs[Boolean]("is_anomaly")).toMap
    assert(got("2020-01-15") === true)
    assert(got.filter(_._2).keySet === Set("2020-01-15"), got.toString)
    // first 7 days have no full trailing window and are absent
    assert(!got.contains("2020-01-07") && got.contains("2020-01-08"))
  }

  test("anomalyDays flags a total-outage day and densifies gaps") {
    // 10 busy days, then a SILENT day 11 (zero events — no raw row at
    // all), then traffic resumes. The spine must surface day 11 as a
    // cnt=0 drop; pre-densify it produced no row and the window
    // silently compressed across the gap.
    val rows = ((1 to 10) ++ (12 to 14)).flatMap { day =>
      (1 to 4).map(i => (ts(f"2020-01-$day%02d 10:0$i%01d:00"), i.toLong))
    }
    val got = Reports.anomalyDays(rows.toDF("t", "user_id"), "t", 7, 1.5)
      .collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        ((r.getAs[Long]("cnt"), r.getAs[Boolean]("is_anomaly")))).toMap
    assert(got.contains("2020-01-11"), s"outage day missing: $got")
    assert(got("2020-01-11") === ((0L, true)))
    // the resume day sees the zero inside its window (avg 24/7 < 4*1.5)
    assert(got("2020-01-12")._1 === 4L && !got("2020-01-12")._2)
  }

  test("ewmaDaily stays finite and exact on a 1500-day series") {
    // one event per day for 1500 days: ewma must be exactly 1.0 at
    // every full-window row — the old 2^i running rescale overflowed
    // to Inf/NaN past ~1024 rows
    val rows = (0 until 1500).map { k =>
      (new java.sql.Timestamp(
        ts("2020-01-01 12:00:00").getTime + k * 86400000L), 1L)
    }
    val got = Reports.ewmaDaily(rows.toDF("t", "user_id"), "t").collect()
    assert(got.length === 1500)
    assert(got.forall(r => !r.getAs[Double]("ewma").isNaN &&
      !r.getAs[Double]("ewma").isInfinite))
    assert(got.forall(_.getAs[Double]("ewma") === 1.0))
  }

  test("ewmaDaily starts at the first count and tracks a level shift") {
    val rows = (1 to 5).flatMap { day =>
      val n = if (day <= 3) 2 else 10
      (1 to n).map(i => (ts(f"2020-01-0$day%01d 10:00:0${i % 10}%01d"), i.toLong))
    }
    val got = Reports.ewmaDaily(rows.toDF("t", "user_id"), "t").collect()
      .map(r => r.getAs[java.sql.Date]("d").toString -> r.getAs[Double]("ewma"))
      .toMap
    assert(got("2020-01-01") === 2.0) // ewma_1 = x_1 exactly
    // after the shift the smoothed value moves toward 10 monotonically
    assert(got("2020-01-04") > 2.0 && got("2020-01-04") < 10.0)
    assert(got("2020-01-05") > got("2020-01-04"))
  }

  test("dailyUniqueHll: exact count carried, estimate within the m=256 error band") {
    // three cardinality regimes: tiny (linear counting), medium, and
    // one spanning the 2.5m switchover region is deliberately absent
    // — the branch choice is deterministic either way
    val rows =
      (1 to 5).flatMap(u => Seq.fill(3)((ts("2020-01-01 10:00:00"), u.toLong))) ++
      (1 to 200).map(u => (ts("2020-01-02 10:00:00"), u.toLong)) ++
      (1 to 900).map(u => (ts("2020-01-03 10:00:00"), (u * 7).toLong))
    val got = Reports.dailyUniqueHll(rows.toDF("t", "uid"), "t", "uid")
      .collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        (r.getAs[Long]("n_exact"), r.getAs[Double]("rel_err")))
      .toMap
    assert(got("2020-01-01")._1 === 5L)
    assert(got("2020-01-02")._1 === 200L)
    assert(got("2020-01-03")._1 === 900L)
    // 1.04/sqrt(256) ~ 6.5% standard error; the fixture's md5 draws
    // are fixed, so these are deterministic pins, not flaky bounds
    assert(got("2020-01-01")._2 < 0.05, s"tiny-day err ${got("2020-01-01")._2}")
    assert(got("2020-01-02")._2 < 0.20, s"medium-day err ${got("2020-01-02")._2}")
    assert(got("2020-01-03")._2 < 0.20, s"large-day err ${got("2020-01-03")._2}")
  }
}
