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

      val (c1, dash) = get(port, "/?date=2020-01-01")
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

      val (c6, rows) = post(port, "/sql", "SELECT 1 AS one")
      assert(c6 === 200 && rows === """[{"one":1}]""")
      val (c7, err) = post(port, "/sql", "SELECT nope FROM nowhere")
      assert(c7 === 400 && err.contains("TABLE_OR_VIEW_NOT_FOUND"))

      // empty body falls back to the console's default query
      // (pragma_database_size parity, web_ballcone.py:134)
      val (c7b, dflt) = post(port, "/sql", "")
      assert(c7b === 200 && dflt.contains("database_size"))

      val (c8, conf) = get(port, "/nginx?service=blog")
      assert(c8 === 200 && conf.contains("access_log syslog:server="))

      // unknowns
      assert(get(port, "/api/ghost/count")._1 === 404)
      assert(get(port, "/api/blog/bogus")._1 === 404)
    } finally api.stop()
  }
}
