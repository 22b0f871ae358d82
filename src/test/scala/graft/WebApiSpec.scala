package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.WebApi
import graft.sources.{GeoIp, Ingest}
import graft.store.ServiceStore

/** The HTTP route surface end-to-end over a real socket. */
class WebApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def seededStore(): ServiceStore = {
    val store = new ServiceStore(spark,
      Files.createTempDirectory("graft-wh-api").toString)
    val lines = (0 until 6).map { i =>
      s"""<190>x: {"service": "${if (i < 4) "blog" else "shop"}", "ip": "10.0.0.${i % 3}", """ +
        s""""host": "h", "path": "/p$i", "status": "200", "referrer": "", """ +
        s""""user_agent": "curl/8.0", "length": $i, "generation_time_milli": 0.5, """ +
        s""""date": "2020-01-0${i % 2 + 1}T06:00:00+00:00"}"""
    }
    store.append(Ingest.pipeline(lines.toDF("value"), GeoIp.demoRanges(spark)))
    store
  }

  test("routes: dashboard, catalog, count, average, top-N, report, sql, nginx") {
    val api = new WebApi(spark, seededStore())
    val port = api.start()
    try {
      val (c0, services) = get(port, "/api/services")
      assert(c0 === 200 && services === """["blog","shop"]""")

      val (c1, dash) = get(port, "/api/dashboard?date=2020-01-01")
      assert(c1 === 200)
      assert(dash === """[{"service":"blog","unique":2},{"service":"shop","unique":1}]""")

      val (c2, counts) = get(port, "/api/blog/count?field=ip")
      assert(c2 === 200)
      assert(counts.contains(""""d":"2020-01-01""""))

      val (c3, avg) = get(port, "/api/blog/average/generation_time")
      assert(c3 === 200 && avg.contains(""""avg_generation_time":0.5"""))

      val (c4, top) = get(port,
        "/api/blog/count-group/ip/path?distinct=true&limit=2")
      assert(c4 === 200)
      assert(top.split("\\{").length - 1 <= 4) // <= 2 per day * 2 days

      val (c5, report) = get(port, "/api/blog/report")
      assert(c5 === 200 && report.contains(""""visits":2"""))

      // monitoring endpoints ride the same daily series (the two-day
      // fixture has no 7-day trail, so anomaly returns header-only [];
      // ewma emits one smoothed row per day)
      val (c5a, anom) = get(port, "/api/blog/anomaly")
      assert(c5a === 200 && anom === "[]", anom)
      val (c5b, ewma) = get(port, "/api/blog/ewma")
      assert(c5b === 200 && ewma.contains(""""ewma":"""), ewma)

      val (c6, rows) = post(port, "/sql", "SELECT 1 AS one")
      assert(c6 === 200 && rows === """[{"one":1}]""")
      val (c7, err) = post(port, "/sql", "SELECT nope FROM nowhere")
      assert(c7 === 400 && err.contains("TABLE_OR_VIEW_NOT_FOUND"))

      // empty body falls back to the console's default query
      // (pragma_database_size parity, web_ballcone.py:134)
      val (c7b, dflt) = post(port, "/sql", "")
      assert(c7b === 200 && dflt.contains("database_size"))

      val (c8, conf) = get(port, "/nginx?service=blog&raw=1")
      assert(c8 === 200 && conf.contains("access_log syslog:server="))

      // unknowns
      assert(get(port, "/api/ghost/count")._1 === 404)
      assert(get(port, "/api/blog/bogus")._1 === 404)
    } finally api.stop()
  }

  test("html ui: dashboard, service page with rowspan grouping, sql console, nginx") {
    // the fixture's events are dated 2020 — widen the report window so
    // the service page's last-N-days queries see them
    val api = new WebApi(spark, seededStore(), days = 5000)
    val port = api.start()
    try {
      // dashboard page: cards per service + store size footer
      val (c1, root) = get(port, "/?date=2020-01-01")
      assert(c1 === 200 && root.startsWith("<!DOCTYPE html>"))
      assert(root.contains("""<a href="/services/blog">blog</a>"""))
      assert(root.contains("2 unique visits today"))
      assert(root.contains("byte"))

      // per-service report page: overview rows, avg table, rowspan
      // date-grouping on the popular-paths table (O19 presentation)
      val (c2, page) = get(port, "/services/blog")
      assert(c2 === 200 && page.contains("<h2 class=\"subtitle\">Overview</h2>"))
      assert(page.contains("rowspan="))
      assert(page.contains("0.5000"))
      // anomaly/EWMA series are wired into the page: canvases + the
      // Chart.js feeds pointing at the JSON endpoints
      assert(page.contains("""<canvas id="ewma""""), page.take(2000))
      assert(page.contains("""<canvas id="anomaly""""))
      assert(page.contains("/api/blog/ewma") && page.contains("/api/blog/anomaly"))
      // and the endpoints those feeds hit actually serve the series
      val (ce, ewmaJson) = get(port, "/api/blog/ewma")
      assert(ce === 200 && ewmaJson.contains("\"ewma\""), ewmaJson.take(300))
      val (ca, anomJson) = get(port, "/api/blog/anomaly")
      assert(ca === 200 && anomJson.contains("\"ratio\"") ||
        anomJson === "[]", anomJson.take(300))
      assert(get(port, "/services/ghost")._1 === 404)

      // sql console: GET renders the form and runs the default query
      val (c3, form) = get(port, "/sql")
      assert(c3 === 200 && form.contains("<textarea") &&
        form.contains("database_size"))
      // form-encoded POST renders the result table
      val enc = java.net.URLEncoder.encode("SELECT 41 + 1 AS answer", "UTF-8")
      val (c4, res) = post(port, "/sql", s"sql=$enc")
      assert(c4 === 200 && res.contains("<th>answer</th>") && res.contains("<td>42</td>"))
      // errors render in the page's error pane, not a 500
      val encBad = java.net.URLEncoder.encode("SELECT nope FROM nowhere", "UTF-8")
      val (c5, err) = post(port, "/sql", s"sql=$encBad")
      assert(c5 === 200 && err.contains("Error") && err.contains("TABLE_OR_VIEW_NOT_FOUND"))

      // nginx page wraps the stanza in HTML
      val (c6, ngx) = get(port, "/nginx?service=blog")
      assert(c6 === 200 && ngx.startsWith("<!DOCTYPE html>") &&
        ngx.contains("access_log syslog:server="))

      // bare /services redirects to the dashboard (reference parity)
      assert(get(port, "/services")._1 === 302)
    } finally api.stop()
  }

  test("sql console renders each engine exception class verbatim in the error pane") {
    // reference parity: web_ballcone.py:142-143 catches the engine
    // error and templates/sql.html:38-43 renders its message verbatim
    // in the page — one case per exception class, each asserting the
    // engine's own message text (not a generic "error") survives into
    // the pane, HTML-escaped, with the page still a 200 form render
    val api = new WebApi(spark, seededStore())
    val port = api.start()
    try {
      def consolePost(q: String): (Int, String) =
        post(port, "/sql", "sql=" + java.net.URLEncoder.encode(q, "UTF-8"))
      def engineMessage(q: String): String =
        try { spark.sql(q).limit(1).collect(); fail(s"expected $q to fail") }
        catch { case e: Throwable => e.getMessage }
      // same entity escaping Html.escape applies (it is package-private)
      def esc(s: String): String = s
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&#39;")

      // ParseException: syntax error at the parser
      val (cp, parse) = consolePost("SELEC 1")
      val parseMsg = engineMessage("SELEC 1")
      assert(cp === 200 && parse.contains("<h2 class=\"subtitle\">Error</h2>"))
      assert(parse.contains("PARSE_SYNTAX_ERROR"), parse.take(800))
      // the engine's first message line renders verbatim (escaped)
      val parseFirst = esc(parseMsg.linesIterator.next())
      assert(parse.contains(parseFirst), s"missing: $parseFirst")

      // AnalysisException: unresolved relation
      val (ca, analysis) = consolePost("SELECT nope FROM nowhere")
      assert(ca === 200 && analysis.contains("TABLE_OR_VIEW_NOT_FOUND"),
        analysis.take(800))
      val analysisFirst = esc(
        engineMessage("SELECT nope FROM nowhere").linesIterator.next())
      assert(analysis.contains(analysisFirst), s"missing: $analysisFirst")

      // AnalysisException: unresolved routine (distinct error class)
      val (cr, routine) = consolePost("SELECT no_such_fn(1)")
      assert(cr === 200 && routine.contains("UNRESOLVED_ROUTINE"),
        routine.take(800))

      // runtime SparkArithmeticException: spark.sql() is lazy, so this
      // one only surfaces at the console's bounded collect — same pane
      val (cd, divide) = consolePost("SELECT 1/0 AS boom")
      assert(cd === 200 && divide.contains("DIVIDE_BY_ZERO"),
        divide.take(800))

      // the erroring page keeps the query in the textarea for editing
      // (reference keeps the form value: templates/sql.html)
      assert(divide.contains("SELECT 1/0 AS boom"), divide.take(800))
    } finally api.stop()
  }

  test("concurrent requests are served in parallel by the pooled executor") {
    val api = new WebApi(spark, seededStore())
    val port = api.start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val codes = Await.result(
        Future.sequence((0 until 8).map(_ =>
          Future(get(port, "/api/services")._1))),
        60.seconds)
      assert(codes.forall(_ === 200), codes.toString)
    } finally api.stop()
  }

  test("sql console caps driver-side materialization with a truncation marker") {
    val api = new WebApi(spark, seededStore(), maxRows = 10)
    val port = api.start()
    try {
      // a huge result must come back truncated at maxRows, not
      // materialize fully on the driver
      val (code, body) = post(port, "/sql", "SELECT id FROM range(500000)")
      assert(code === 200)
      assert(body.startsWith("""{"truncated":true,"limit":10,"rows":["""))
      assert(body.split("\\{\"id\"").length - 1 === 10)
      // small results keep the plain-array shape
      val (c2, small) = post(port, "/sql", "SELECT 1 AS one")
      assert(c2 === 200 && small === """[{"one":1}]""")
    } finally api.stop()
  }
}
