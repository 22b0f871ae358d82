package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc graph-ANN SERVING recall pricing (not a driver contract):
  * for each (cells, beam, serve-rounds, entryProbe) configuration,
  * build the NN-Descent index at rest and measure the walk's avg
  * recall@10 against the brute-force truth plus the serve wall — the
  * table that prices the entry-budget rule (cells ∝ √corpus vs the
  * old fixed 8) and the multi-probe hedge. Args: optional cell
  * counts (default: 8 and ceil(√N)).
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
    val auto = math.min(1024L, math.max(8L,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val cellCounts =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, auto)
    println(s"[gsweep] dir=$dir n=$n autoCells=$auto")
    val truth = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 10)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    for (cells <- cellCounts) {
      val cent = e.filter(col("vec_id") < cells)
      val path = s"/tmp/graft-gsweep/c$cells"
      val tb0 = System.nanoTime()
      Similarity.graphWriteAtRest(e, cent, 10, 3, path)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      for (beam <- Seq(8, 16); rounds <- Seq(2, 3); probe <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        val approx = Similarity
          .graphTopKAtRest(spark, path, e.filter(col("vec_id") < 10),
            cent, beam = beam, rounds = rounds, k = 10,
            entryProbe = probe)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        val recall = truth.join(approx, Seq("q_id", "vec_id"), "left")
          .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
          .head.getDouble(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[gsweep] cells=$cells%4d beam=$beam%2d rounds=$rounds%d " +
          f"probe=$probe%d recall_at_10=$recall%.4f serve_sec=$sec%.2f " +
          f"build_sec=$buildSec%.1f")
      }
    }
    spark.stop()
  }
}
