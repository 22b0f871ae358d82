package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Dates
import graft.operators.Reports
import graft.query.Console
import graft.store.ServiceStore

/** The HTTP surface of the reference (ballcone/__main__.py:72-80 routes;
  * handlers web_ballcone.py) on the JDK's built-in server — no
  * dependencies beyond Spark.
  *
  *   GET  /                                  dashboard (O18)
  *   GET  /api/services                      catalog list (O7)
  *   GET  /api/{s}/count[?field=&start=&stop=]          O11
  *   GET  /api/{s}/average/{field}[?start=&stop=]       O10
  *   GET  /api/{s}/count-group/{field}/{group}
  *         [?distinct=&ascending=&limit=&start=&stop=]  O12+O13
  *   GET  /api/{s}/report[?date=]            visits⟗unique merge (O17)
  *   POST /sql                               raw SQL console (O15)
  *   GET  /nginx?service={s}                 nginx config generator
  *
  * Results are encoded with Spark's row-to-JSON (dates → ISO strings,
  * O20). Query knobs mirror web_ballcone.py:117-120 (`distinct`'s value
  * doubles as the count field there; here `field` is explicit).
  */
final class WebApi(spark: SparkSession, store: ServiceStore,
                   topLimit: Int = 5) {

  private val console = new Console(spark, store)
  private var server: HttpServer = _
  // shim views are rebuilt at most every 30 s (O21 discipline: the
  // db-size pragma and catalog listing are not per-request work)
  private val ShimTtlMillis = 30000L
  @volatile private var shimsRefreshedAt = 0L

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", handler(dashboard))
    server.createContext("/api/services", handler(_ => listServices()))
    server.createContext("/api", handler(api))
    server.createContext("/sql", handler(sql))
    server.createContext("/nginx", handler(nginx))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------- handlers

  private def dashboard(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestURI.getPath != "/") return (404, notFound)
    if (store.list().isEmpty) return (200, "[]")
    val day = param(ex, "date").getOrElse(Dates.todayUtc().toString)
    // ONE grouped aggregate over the partitioned store — not one Spark
    // job per service (Reports.dashboard scaladoc; O18); services with
    // no events that day still render with 0, like the reference
    val agg = Reports.dashboard(store.readAll(), "datetime", "service",
        "ip", day)
      .collect()
      .map(r => r.getAs[String]("service") -> r.getAs[Long]("cnt"))
      .toMap
    val rows = store.list().map(s => s -> agg.getOrElse(s, 0L))
      .sortBy { case (s, c) => (-c, s) }
    (200, rows.map { case (s, c) =>
      s"""{"service":${jsonString(s)},"unique":$c}"""
    }.mkString("[", ",", "]"))
  }

  private val notFound = """{"error":"not found"}"""

  private def listServices(): (Int, String) =
    (200, store.list().map("\"" + _ + "\"").mkString("[", ",", "]"))

  private def api(ex: HttpExchange): (Int, String) = {
    val parts = ex.getRequestURI.getPath.stripPrefix("/api/").split("/")
    if (parts.length < 2) return (404, notFound)
    val service = parts(0)
    if (!store.exists(service))
      return (404, s"""{"error":${jsonString(s"unknown service $service")}}""")
    val df = store.read(service)
    val start = param(ex, "start")
    val stop = param(ex, "stop")
    val result: Either[String, DataFrame] = parts(1) match {
      case "count" =>
        Right(Reports.dailyCount(df, "datetime", param(ex, "field"), start, stop))
      case "average" if parts.length == 3 =>
        Right(Reports.dailyAverage(df, "datetime", parts(2), start, stop))
      case "count-group" if parts.length == 4 =>
        val limit = param(ex, "limit") match {
          case Some(v) => v.toIntOption.filter(_ > 0).getOrElse(
            return (400, s"""{"error":${jsonString(s"limit must be a positive integer, got '$v'")}}"""))
          case None => topLimit
        }
        def boolParam(name: String, default: Boolean): Either[String, Boolean] =
          param(ex, name) match {
            case Some(v) => v.toBooleanOption
              .toRight(s"$name must be true or false, got '$v'")
            case None => Right(default)
          }
        (boolParam("distinct", default = true),
          boolParam("ascending", default = false)) match {
          case (Right(d), Right(a)) =>
            Right(Reports.topNPerDay(df, "datetime", parts(2), parts(3),
              distinct = d, ascending = a, n = limit, start, stop))
          case (Left(e), _) => return (400, s"""{"error":${jsonString(e)}}""")
          case (_, Left(e)) => return (400, s"""{"error":${jsonString(e)}}""")
        }
      case "report" =>
        Right(Reports.alignByDate(
          Reports.dailyCount(df, "datetime", None, start, stop),
          Reports.dailyCount(df, "datetime", Some("ip"), start, stop)))
      case _ => Left(s"unknown endpoint ${parts(1)}")
    }
    result match {
      case Right(r) => (200, toJsonArray(r))
      case Left(err) => (404, s"""{"error":${jsonString(err)}}""")
    }
  }

  private def sql(ex: HttpExchange): (Int, String) = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val text = if (body.trim.isEmpty) console.defaultQuery else body
    val now = System.currentTimeMillis()
    if (now - shimsRefreshedAt > ShimTtlMillis) {
      console.refreshShims()
      shimsRefreshedAt = now
    }
    console.run(text) match {
      case Right(df) => (200, toJsonArray(df))
      case Left(err) => (400, s"""{"error":${jsonString(err)}}""")
    }
  }

  /** nginx config generator (web_ballcone.py renders the log_format +
    * access_log stanza users paste into their server block).
    */
  private def nginx(ex: HttpExchange): (Int, String) = {
    val service = param(ex, "service").getOrElse("example")
    if (!store.checkService(service))
      return (400, s"""{"error":"invalid service name"}""")
    val conf =
      s"""log_format graft_$service escape=json
         |  '{"service": "$service", "ip": "$$remote_addr", '
         |  '"host": "$$host", "path": "$$request_uri", '
         |  '"status": "$$status", "referrer": "$$http_referer", '
         |  '"user_agent": "$$http_user_agent", "length": $$bytes_sent, '
         |  '"generation_time_milli": $$request_time, '
         |  '"date": "$$time_iso8601"}';
         |access_log syslog:server=127.0.0.1:65140 graft_$service;
         |""".stripMargin
    (200, conf)
  }

  // -------------------------------------------------------------- helpers

  private def handler(f: HttpExchange => (Int, String)):
      com.sun.net.httpserver.HttpHandler = { ex =>
    val (code, body) =
      try f(ex)
      catch { case e: Throwable => (500, s"""{"error":${jsonString(e.getMessage)}}""") }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      if (body.startsWith("{") || body.startsWith("[")) "application/json"
      else "text/plain")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(
      _.split("&").map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == name && v.nonEmpty => v
      })

  private def toJsonArray(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def jsonString(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
