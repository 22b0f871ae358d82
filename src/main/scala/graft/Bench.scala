package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract → BENCH_r{N}.json).
  *
  * Each query is forced end-to-end with a noop-format write so the full
  * plan executes (a bare `count()` would let Catalyst prune most of the
  * work). One warm-up pass of the first query absorbs JVM/codegen
  * startup so numbers reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SargableDates

    // a query failure must FAIL the bench (errors listed + nonzero
    // exit), not silently vanish from the total and make a regression
    // look like a speedup
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        Queries.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        errors.getOrElseUpdate(name,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Each query runs twice and reports the faster pass: the first
    // execution is dominated by one-time JIT + whole-stage-codegen
    // compilation (up to 3x the steady-state time at this data size),
    // and steady-state throughput is the quantity that scales to the
    // cluster. Cold-start cost is amortized over a job's lifetime.
    def run(name: String): Double = {
      val a = once(name)
      val b = once(name)
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    }

    // quiet-box gate: wait (bounded) for the 1-min loadavg to drop
    // before the first timed pass, and self-label the run "contended"
    // on timeout — a loaded-box number must never read as a plan
    // regression (round 6: loadavg 5.35 measured a 1.3 s query at 6.2 s)
    val quiet = BenchEnv.awaitQuiet()
    val loadStart = BenchEnv.loadavg()

    // global warm-up covering the distinct infrastructure paths:
    // parquet scan + sort (o08), broadcast-join machinery (q5), and
    // the documents/md5 pipeline — broadcast thread pools and codegen
    // for these dominate first-run noise otherwise
    Seq("o08_select_range", "tpch_q5_local_supplier", "text_stats")
      .foreach(once)
    val results = Queries.headline.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val errJson = errors.map { case (k, v) => s""""$k":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","contended":${!quiet},"loadavg_start":"$loadStart","loadavg_end":"${BenchEnv.loadavg()}","passes":"min_of_2"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
