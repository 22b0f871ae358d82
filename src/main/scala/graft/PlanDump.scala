package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (round 17): dump `.explain("formatted")` for named
  * declared queries to `plans/r18/<name>_<tag>.txt` — the before/after
  * plan evidence the optimization round commits next to the code.
  * Usage: runMain graft.PlanDump <tag> <query> [query ...]
  * (sfDir via SPARK_GRAFT_SF_DIR, default sf0.1.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SargableDates
    new java.io.File("plans/r18").mkdirs()
    names.foreach { name =>
      val df = Queries.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"plans/r18/${name}_$tag.txt")
      try w.write(txt) finally w.close()
      println(s"[plan] wrote plans/r18/${name}_$tag.txt")
    }
    spark.stop()
  }
}
