package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc warm-start rebuild pricing (not a driver contract): the
  * graph lifecycle is the engine's biggest absolute build cost, and a
  * drift-triggered rebuild pays it from scratch — this sweep measures
  * what seeding NN-Descent from the previous version's neighbor lists
  * buys. Scenario per corpus: publish v0 COLD on the base slice
  * (4/5 of the corpus, 3 descent rounds — the deployed config), grow
  * the corpus by the remaining fifth, then rebuild v1 twice:
  *  - cold: fresh knnGraph on the grown corpus, 3 rounds;
  *  - warm: [[graft.operators.Similarity.graphPublishVersionWarm]] —
  *    v0's lists re-scored + cell-seeded new nodes, `warmRounds`.
  * Recorded per arm: rebuild wall, serve wall, and walk recall@10
  * (avg AND min — the declared gate is ≥0.9 avg / ≥0.7 min) against
  * the brute-force truth on the grown corpus.
  *
  * Env: SPARK_GRAFT_WS_ROUNDS = comma list of warm round counts
  * (default "0,1,2"); SPARK_GRAFT_SF_DIR = corpus dir.
  */
object WarmSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.read(spark, dir, "embeddings")
      .localCheckpoint()
    val n = e.count()
    val auto = Similarity.autoCellsOf(n)
    val warmRounds = sys.env.getOrElse("SPARK_GRAFT_WS_ROUNDS", "0,1,2")
      .split(",").map(_.trim.toInt).toSeq
    val base = e.filter(col("vec_id") % 5 =!= 0)
    println(s"[wsweep] dir=$dir n=$n base=${base.count()} autoCells=$auto")
    val cent = Similarity.lloydCentroidDf(e, auto, 1).localCheckpoint()
    val truth = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 10)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    def recallOf(path: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val approx = Similarity
        .graphTopKAtRest(spark, path, e.filter(col("vec_id") < 10),
          Similarity.graphStoredCentroids(spark, path),
          beam = 20, rounds = 4, k = 10, entryProbe = 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val rec = truth.join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)).as("r"))
        .agg(avg(col("r")), min(col("r"))).head
      ((System.nanoTime() - t0) / 1e9, rec.getDouble(0), rec.getDouble(1))
    }
    // cold rebuild arm on the grown corpus
    val tc = System.nanoTime()
    val coldPath = s"/tmp/graft-wsweep/cold-${System.nanoTime()}"
    Similarity.graphWriteAtRest(e, cent, 10, 3, coldPath)
    val coldSec = (System.nanoTime() - tc) / 1e9
    val (csv, cavg, cmin) = recallOf(coldPath)
    println(f"[wsweep] arm=cold rounds=3 rebuild_sec=$coldSec%.1f " +
      f"serve_sec=$csv%.2f recall_avg=$cavg%.4f recall_min=$cmin%.4f")
    // warm arms: seeded from v0, published as v1 (rotation-compatible)
    for (wr <- warmRounds) {
      val wroot = s"/tmp/graft-wsweep/warm$wr-${System.nanoTime()}"
      Similarity.graphPublishVersion(base, cent, 10, 3, wroot)
      val tw = System.nanoTime()
      val v1 = Similarity.graphPublishVersionWarm(e, cent, 10, wroot,
        warmRounds = wr)
      val warmSec = (System.nanoTime() - tw) / 1e9
      val (wsv, wavg, wmin) = recallOf(
        Similarity.graphVersionPath(wroot, v1))
      println(f"[wsweep] arm=warm rounds=$wr rebuild_sec=$warmSec%.1f " +
        f"serve_sec=$wsv%.2f recall_avg=$wavg%.4f recall_min=$wmin%.4f " +
        f"vs_cold=${warmSec / coldSec}%.2fx")
    }
    spark.stop()
  }
}
