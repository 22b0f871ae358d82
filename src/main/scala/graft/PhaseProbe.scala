package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.Similarity

/** Dev harness (round 17, guide §1): decompose the heaviest ANN
  * lifecycle queries into their phases — centroid training, index
  * build, layout write, append, freshness check, probe/walk — and
  * time each phase separately, so optimization targets the phase that
  * actually carries the wall instead of the query total. Not part of
  * the driver contract.
  *
  * Usage: runMain graft.PhaseProbe [sfDir] — prints one line per
  * phase, two passes each (cold + warm), plus the phase sum next to
  * the whole-query noop time for cross-checking.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-phase scheduler telemetry: jobs launched, stages completed,
    // tasks run, summed executor task time — the decomposition that
    // says whether a phase's wall is per-job overhead (many jobs/
    // stages, low task time) or real compute (task time ≈ wall × cores)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = { stages.incrementAndGet(); () }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (e.taskMetrics != null)
            taskMs.addAndGet(e.taskMetrics.executorRunTime)
          ()
        }
      })
    import org.apache.spark.metrics.source.CodegenMetrics
    def compileMs: Long = {
      val s = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
      // histogram of per-compilation ms; count × mean ≈ total
      (CodegenMetrics.METRIC_COMPILATION_TIME.getCount * s.getMean).toLong
    }
    def t[A](name: String)(f: => A): A = {
      val (j0, s0, k0, m0, c0, cm0) =
        (jobs.get, stages.get, tasks.get, taskMs.get,
          CodegenMetrics.METRIC_COMPILATION_TIME.getCount, compileMs)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before deltas
      Thread.sleep(100)
      println(f"[phase] $name%-28s $wall%7.2f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d " +
        f"tasks=${tasks.get - k0}%4d taskTime=${(taskMs.get - m0) / 1e3}%6.1f s " +
        f"compiles=${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0}%3d " +
        f"compileMs=${compileMs - cm0}%5d")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cells = Similarity.autoCellsOf(n)
    println(s"[phase] corpus n=$n cells=$cells dir=$dir")

    // warm the session (codegen, parquet reader paths)
    noop(e)

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: sim_topk_graph lifecycle ===")
      val cent = t("graph.lloyd")(
        Similarity.lloydCentroidDf(e, cells, 1))
      val path = s"target/atrest/probe-graph"
      val edges = t("graph.knn(build3r)") {
        val g = Similarity.knnGraph(e, cent, 10, 3)
        g.localCheckpoint(eager = true) // force build
      }
      t("graph.write(layout)") {
        Similarity.graphWriteAtRest(e, cent, 10, 3, path)
      }
      val _ = edges
      t("graph.walk(serve)") {
        noop(Similarity.graphTopKAtRest(spark, path,
          e.filter(col("vec_id") < 10), cent,
          beam = 20, rounds = 4, k = 10, entryProbe = 3))
      }
    }

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: sim_topk_ivf_atrest lifecycle ===")
      val cent = t("ivf.lloyd")(Similarity.lloydCentroidDf(e, cells, 1))
      val path = "target/atrest/probe-ivf"
      t("ivf.write")(Similarity.ivfWriteAtRest(e, cent, path))
      t("ivf.probe") {
        noop(Similarity.ivfTopKAtRest(spark, path,
          e.filter(col("vec_id") < 10), cent, nProbe = 3, k = 10))
      }
    }

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: sim_topk_ivfpq_atrest lifecycle ===")
      val books = t("ivfpq.trainBooks(2i)")(
        Similarity.pqTrainBooks(e, e.filter(col("vec_id") < 16),
          m = 16, iters = 2))
      val cent = e.filter(col("vec_id") < cells)
      val path = "target/atrest/probe-ivfpq"
      t("ivfpq.write")(Similarity.ivfPqWriteAtRest(e, cent, books, path))
      t("ivfpq.probe") {
        noop(Similarity.ivfPqTopKAtRest(spark, path,
          e.filter(col("vec_id") < 10), cent, books, nProbe = 2, k = 10))
      }
    }

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: sim_topk_ivfpq_append lifecycle ===")
      val books = t("ap.trainBooks(2i)")(
        Similarity.pqTrainBooks(e, e.filter(col("vec_id") < 16),
          m = 16, iters = 2))
      val cent = e.filter(col("vec_id") < cells)
      val path = "target/atrest/probe-ivfpqap"
      t("ap.writeIndex(4/5)") {
        Similarity.ivfPqWriteIndex(e.filter(col("vec_id") % 5 =!= 0),
          cent, books, path)
      }
      t("ap.appendDelta(1/5)") {
        Similarity.ivfPqAppendDelta(e.filter(col("vec_id") % 5 === 0), path)
      }
      t("ap.indexFresh") {
        require(Similarity.indexFresh(spark, path, e), "fresh")
      }
      t("ap.probe") {
        noop(Similarity.ivfPqTopKAtRest(spark, s"$path/codes",
          e.filter(col("vec_id") < 10),
          Similarity.ivfStoredCentroids(spark, path),
          Similarity.ivfPqStoredBooks(spark, path), nProbe = 2, k = 10))
      }
    }

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: sim_topk_graph_append lifecycle ===")
      val base = e.filter(col("vec_id") % 5 =!= 0)
      val cent = t("gap.lloyd(base)")(
        Similarity.lloydCentroidDf(base, Similarity.autoCells(base), 1))
      val path = "target/atrest/probe-graphap"
      t("gap.write(4/5)") {
        Similarity.graphWriteAtRest(base, cent, 10, 3, path)
      }
      t("gap.appendDelta(1/5)") {
        Similarity.graphAppendDelta(e.filter(col("vec_id") % 5 === 0),
          path, beam = 20, rounds = 4, entryProbe = 3)
      }
      t("gap.indexFresh") {
        require(Similarity.indexFresh(spark, path, e), "fresh")
      }
      t("gap.walk") {
        noop(Similarity.graphTopKAtRest(spark, path,
          e.filter(col("vec_id") < 10),
          Similarity.graphStoredCentroids(spark, path),
          beam = 20, rounds = 4, k = 10, entryProbe = 3))
      }
    }

    spark.stop()
  }
}
