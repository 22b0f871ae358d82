package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-Agent → (platform, browser, robot) as pure regexp expression
  * chains — no UDF, stays inside whole-stage codegen.
  *
  * The reference delegates to httpagentparser at ingest
  * (ballcone/syslog_protocol.py:71,83-87); parity is pinned to the
  * golden fixture values, not library bug-for-bug (SURVEY §7.4.5).
  */
object UserAgent {

  private def ext(ua: Column, re: String): Column =
    nullif(regexp_extract(ua, re, 1), lit(""))

  def isRobot(ua: Column): Column =
    ua.rlike("(?i)(bot|crawler|spider|slurp|curl|wget)")

  def browserName(ua: Column): Column =
    when(ua.contains("Googlebot"), "Googlebot")
      .when(ua.rlike("Edge?/"), "Edge")
      .when(ua.contains("OPR/"), "Opera")
      .when(ua.contains("Chrome/"), "Chrome")
      .when(ua.contains("Firefox/"), "Firefox")
      .when(ua.contains("Safari/") && ua.contains("Version/"), "Safari")
      .when(ua.contains("MSIE "), "IE")

  def browserVersion(ua: Column): Column =
    when(ua.contains("Googlebot"), ext(ua, "Googlebot/([\\d.]+)"))
      .when(ua.rlike("Edge?/"), ext(ua, "Edge?/([\\d.]+)"))
      .when(ua.contains("OPR/"), ext(ua, "OPR/([\\d.]+)"))
      .when(ua.contains("Chrome/"), ext(ua, "Chrome/([\\d.]+)"))
      .when(ua.contains("Firefox/"), ext(ua, "Firefox/([\\d.]+)"))
      .when(ua.contains("Version/"), ext(ua, "Version/([\\d.]+)"))
      .when(ua.contains("MSIE "), ext(ua, "MSIE ([\\d.]+)"))

  def platformName(ua: Column): Column =
    when(ua.contains("Windows NT"), "Windows")
      .when(ua.contains("Android"), "Android")
      .when(ua.rlike("iPhone OS|iPad"), "iOS")
      .when(ua.contains("Mac OS X"), "Mac OS")
      .when(ua.contains("Linux"), "Linux")

  def platformVersion(ua: Column): Column = {
    val v = when(ua.contains("Windows NT"), ext(ua, "Windows NT ([\\d.]+)"))
      .when(ua.contains("Android"), ext(ua, "Android ([\\d.]+)"))
      .when(ua.rlike("iPhone OS|iPad"), ext(ua, "OS ([\\d_]+)"))
      .when(ua.contains("Mac OS X"), ext(ua, "Mac OS X ([\\d_.]+)"))
    replace(v, lit("_"), lit("."))
  }

  /** All five derived columns as a struct (the reference explodes
    * `user_agent` into exactly these: syslog_protocol.py:83-87).
    */
  def parse(ua: Column): Column = struct(
    platformName(ua).as("platform_name"),
    platformVersion(ua).as("platform_version"),
    browserName(ua).as("browser_name"),
    browserVersion(ua).as("browser_version"),
    isRobot(ua).as("is_robot"))
}
