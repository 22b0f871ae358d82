package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for local iteration (not a driver
  * contract): min-of-3 noop-write wall seconds per named query, with
  * per-pass wall + GC-time deltas (every collector's MXBean, summed)
  * — the decomposition that says whether a quiet-vs-quiet spread on
  * an unchanged plan is compute or heap sensitivity.
  * SPARK_GRAFT_TIME_PASSES overrides the pass count (default 3).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_TIME_PASSES", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SargableDates
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    args.foreach { name =>
      def once(): (Double, Double) = {
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        Queries.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3)
      }
      once() // warm
      val runs = (1 to passes).map(_ => once())
      runs.zipWithIndex.foreach { case ((w, g), i) =>
        println(f"[time] $name%s pass${i + 1}%d wall=$w%.2f s gc=$g%.2f s " +
          f"load=${BenchEnv.load1()}%.2f")
      }
      println(f"[time] $name%s ${runs.map(_._1).min}%.2f s " +
        f"(min of $passes, gc at min ${runs.minBy(_._1)._2}%.2f s)")
    }
    spark.stop()
  }
}
