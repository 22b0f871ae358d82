package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Prices the incremental-append path ALONE — the measurement the
  * r16 verdict asked for: `sim_topk_ivfpq_append`'s headline number
  * deliberately bundles build(4/5) + append(1/5) + probe, so its
  * curve conflates the build with the append claim. This sweep splits
  * the phases and measures the claim that matters at 100 TB —
  * **append cost ∝ delta, not corpus** — on all three serve tiers
  * (IVF, IVFPQ, graph):
  *
  *  - per corpus point (sf0.1 and the synthesized sf1, a 10× decade):
  *    build the index on the low-80% frontier, then time appends of a
  *    5%-of-corpus delta and a 20%-of-corpus delta onto COPIES of the
  *    standing layout (delta-proportionality within a corpus: expect
  *    ~4×), plus a FIXED 200-vector delta (cross-corpus flatness: the
  *    same absolute delta should cost about the same against a 10×
  *    base);
  *  - the probe/walk after the 20% append is timed separately (the
  *    serve cost the appended index actually charges).
  *
  * Layout copies keep every arm appending onto the same built state
  * without re-paying (or re-timing) the build. Output: one
  * `[appsweep]` line per (tier, corpus, arm) — tier=graph walks are
  * the insertion-by-search cost, the tier's structural ∝-delta story.
  */
object AppendSweep {

  private def copyDir(spark: SparkSession, from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val dst = new org.apache.hadoop.fs.Path(to)
    val fs = src.getFileSystem(conf)
    if (fs.exists(dst)) { fs.delete(dst, true); () }
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
    ()
  }

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val testdata =
      sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val sf1Dir =
      sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tiers = sys.env.getOrElse("SPARK_GRAFT_TIERS", "ivf,ivfpq,graph")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ScaleSynth.synthesize(spark, s"$testdata/sf0.1", sf1Dir, replicas = 10)
    val points = Seq(
      "sf0.1" -> s"$testdata/sf0.1",
      "sf1" -> sf1Dir)

    for ((label, dir) <- points) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
      val n = emb.count()
      // frontier splits by exact id PERCENTILE (synthesized points
      // offset replica ids by r·10⁷ — arithmetic on n misses): base =
      // low 80%, deltas carved off the top so every arm is a
      // PURE-GROWTH append
      import org.apache.spark.sql.functions.{expr, max}
      val cuts = emb.agg(expr("percentile(vec_id, 0.8)"),
        expr("percentile(vec_id, 0.85)")).head
      val (cut80, cut85) = (cuts.getDouble(0).toLong, cuts.getDouble(1).toLong)
      val base = emb.filter(col("vec_id") < cut80)
      val d5 = emb.filter(col("vec_id") >= cut80 && col("vec_id") < cut85)
      val d20 = emb.filter(col("vec_id") >= cut80)
      val absCut = emb.filter(col("vec_id") >= cut80)
        .orderBy(col("vec_id")).limit(200)
        .agg(max(col("vec_id"))).head.getLong(0)
      val dAbs = emb.filter(col("vec_id") >= cut80 &&
        col("vec_id") <= absCut)
      val queries = emb.filter(col("vec_id") < 10)
      val cent = Similarity.lloydCentroidDf(base,
        Similarity.autoCells(base), 1).localCheckpoint()

      def arms(tier: String, build: String => Double,
               append: (DataFrame, String) => Unit,
               probe: String => Unit): Unit = {
        val root = s"/tmp/graft-appsweep/$tier-$label"
        val (buildSec, _) = timed(build(root))
        println(f"[appsweep] tier=$tier corpus=$label n=$n arm=build " +
          f"sec=$buildSec%.2f")
        for ((arm, delta) <- Seq("append_abs200" -> dAbs,
            "append_p5" -> d5, "append_p20" -> d20)) {
          val work = s"$root-$arm"
          copyDir(spark, root, work)
          val dn = delta.count()
          val (sec, _) = timed(append(delta, work))
          println(f"[appsweep] tier=$tier corpus=$label n=$n arm=$arm " +
            f"delta=$dn sec=$sec%.2f per_krow=${sec / (dn / 1000.0)}%.2f")
          if (arm == "append_p20") {
            val (psec, _) = timed(probe(work))
            println(f"[appsweep] tier=$tier corpus=$label n=$n " +
              f"arm=probe_after sec=$psec%.2f")
          }
        }
      }

      if (tiers.contains("ivf"))
        arms("ivf",
          root => { Similarity.ivfWriteIndex(base, cent, root); 0.0 },
          (d, p) => { Similarity.ivfAppendDelta(d, p); () },
          p => Similarity.ivfTopKAtRest(spark, s"$p/codes", queries,
              Similarity.ivfStoredCentroids(spark, p), nProbe = 3, k = 10)
            .write.format("noop").mode("overwrite").save())

      if (tiers.contains("ivfpq")) {
        val books = Similarity.pqTrainBooks(base,
          spark.read.parquet(s"$dir/embeddings.parquet")
            .filter(col("vec_id") < 16), 16, 1)
        arms("ivfpq",
          root => { Similarity.ivfPqWriteIndex(base, cent, books, root); 0.0 },
          (d, p) => { Similarity.ivfPqAppendDelta(d, p); () },
          p => Similarity.ivfPqTopKAtRest(spark, s"$p/codes", queries,
              Similarity.ivfStoredCentroids(spark, p),
              Similarity.ivfPqStoredBooks(spark, p), nProbe = 3, k = 10)
            .write.format("noop").mode("overwrite").save())
      }

      if (tiers.contains("graph"))
        arms("graph",
          root => { Similarity.graphWriteAtRest(base, cent, 10, 3, root); 0.0 },
          (d, p) => { Similarity.graphAppendDelta(d, p); () },
          p => Similarity.graphTopKAtRest(spark, p, queries,
              Similarity.graphStoredCentroids(spark, p),
              beam = 20, rounds = 4, k = 10, entryProbe = 3)
            .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
