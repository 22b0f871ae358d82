package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc graph-ANN SERVING recall pricing (not a driver contract):
  * for each build configuration (entry-centroid Lloyd refinement,
  * NN-Descent k, descent rounds, entry-head rank rule), build the
  * index at rest and measure the greedy walk's recall@10 against the
  * brute-force truth — avg AND min per query, since the declared gate
  * is both ("≥0.9 avg and ≥0.7 min") — plus the build/serve walls.
  * The r13 sweep priced the entry-budget rule (cells ∝ √corpus vs the
  * old fixed 8); the r14 axes price entry QUALITY: Lloyd-refined
  * centroids over the √n seed, centroid-nearest entry heads vs
  * first-by-id, and the build k / descent-round budget behind the
  * graph itself (the NND slice was the remaining weak tier: recall@5
  * 0.48 at the r13 config).
  *
  * Env: SPARK_GRAFT_GS_BUILDS = comma list of `lloyd:k:rounds:head`
  * (lloyd = "raw" or an iteration count; head = "id" or "central");
  * SPARK_GRAFT_GS_SERVES = comma list of `beam:rounds:probe`.
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.read(spark, dir, "embeddings")
    val n = e.count()
    val auto = Similarity.autoCellsOf(n)
    val builds = sys.env.getOrElse("SPARK_GRAFT_GS_BUILDS",
        "raw:10:3:id,1:10:3:id,1:10:3:central,1:16:3:central,1:10:5:central")
      .split(",").map(_.trim.split(":")).toSeq
    val serves = sys.env.getOrElse("SPARK_GRAFT_GS_SERVES",
        "16:3:2,16:4:2,20:3:2,20:4:3")
      .split(",").map(_.trim.split(":").map(_.toInt)).toSeq
    println(s"[gsweep] dir=$dir n=$n autoCells=$auto")
    val truth = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 10)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    for (Array(ll, kS, grS, head) <- builds) {
      val bk = kS.toInt; val gr = grS.toInt
      val tc0 = System.nanoTime()
      val cent = ll match {
        case "raw" => e.filter(col("vec_id") < auto)
        case it => Similarity.lloydCentroidDf(e, auto, it.toInt)
          .localCheckpoint()
      }
      val centSec = (System.nanoTime() - tc0) / 1e9
      val path = s"/tmp/graft-gsweep/l$ll-k$bk-g$gr-$head"
      val tb0 = System.nanoTime()
      Similarity.graphWriteAtRest(e, cent, bk, gr, path,
        centralHeads = head == "central")
      val buildSec = (System.nanoTime() - tb0) / 1e9
      for (Array(beam, rounds, probe) <- serves if beam <= 2 * bk) {
        val t0 = System.nanoTime()
        val approx = Similarity
          .graphTopKAtRest(spark, path, e.filter(col("vec_id") < 10),
            cent, beam = beam, rounds = rounds, k = 10,
            entryProbe = probe)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        val rec = truth.join(approx, Seq("q_id", "vec_id"), "left")
          .groupBy(col("q_id"))
          .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0))
            .as("r"))
          .agg(avg(col("r")), min(col("r")))
          .head
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[gsweep] lloyd=$ll%3s k=$bk%2d grounds=$gr%d " +
          f"head=$head%7s beam=$beam%2d rounds=$rounds%d probe=$probe%d " +
          f"recall_avg=${rec.getDouble(0)}%.4f " +
          f"recall_min=${rec.getDouble(1)}%.4f serve_sec=$sec%.2f " +
          f"build_sec=$buildSec%.1f cent_sec=$centSec%.1f")
      }
    }
    spark.stop()
  }
}
