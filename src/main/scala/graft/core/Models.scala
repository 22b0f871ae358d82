package graft.core

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset}

/** O16 — typed result models (reference: ballcone/dao.py:114-139 defines
  * Count/CountResult/Average/AverageResult NamedTuples with hand-rolled
  * row decoding; Spark's product encoders make the typing free).
  */
final case class DailyCount(d: Date, cnt: Long)

final case class GroupCount(d: Date, grp: String, cnt: Long)

final case class DailyAverage(d: Date, avg: Double, sum: Double, cnt: Long)

object Models {

  /** Decode an O11 result (d, cnt). */
  def asDailyCounts(df: DataFrame): Dataset[DailyCount] = {
    import df.sparkSession.implicits._
    df.as[DailyCount]
  }

  /** Decode an O12/O13 result (d, grp, cnt). */
  def asGroupCounts(df: DataFrame): Dataset[GroupCount] = {
    import df.sparkSession.implicits._
    df.as[GroupCount]
  }

  /** Decode an O10 result, normalizing the field-suffixed column names
    * (avg_<field>, sum_<field>, cnt_<field>).
    */
  def asDailyAverages(df: DataFrame, field: String): Dataset[DailyAverage] = {
    import df.sparkSession.implicits._
    df.withColumnRenamed(s"avg_$field", "avg")
      .withColumnRenamed(s"sum_$field", "sum")
      .withColumnRenamed(s"cnt_$field", "cnt")
      .as[DailyAverage]
  }
}
