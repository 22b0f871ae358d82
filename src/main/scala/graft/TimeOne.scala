package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for local iteration (not a driver
  * contract): min-of-3 noop-write wall seconds per named query.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SargableDates
    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        Queries.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = Seq(once(), once(), once()).min
      println(f"[time] $name%s $t%.2f s")
    }
    spark.stop()
  }
}
