package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: print the executed plan + timed runs for one declared
  * query (`runMain graft.Profile <name> [sfDir]`). Not part of the
  * driver contract; used to audit plan shapes against the scale notes
  * in each operator's scaladoc.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("tpch_q5_local_supplier")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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

    def once(): Double = {
      val t0 = System.nanoTime()
      Queries.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = (1 to 3).map(_ => once())
    println(s"=== $name @ $sfDir: " +
      times.map(t => f"$t%.2f").mkString(" ") + " s")
    val df = Queries.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
