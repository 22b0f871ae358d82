package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc IVF (cells × nProbe) pricing (not a driver contract): for
  * each configuration, avg recall@10 of `ivfTopK` against the
  * brute-force truth plus the serve wall — the table that says what
  * the √n cell rule costs/buys on the SCAN-TIME IVF tier (the graph
  * tier's r13 treatment applied to its IVF sibling). At a FIXED cell
  * count the per-query scan fraction is probe/cells — constant, so
  * cost grows linearly with the corpus; √n cells with a matching
  * probe budget is the scale shape (cost ∝ probe·n/√n), but recall
  * at fixed nProbe falls as cells multiply — the sweep prices the
  * probe count that buys it back. Args: cell counts (default: 8 and
  * ⌈√N⌉).
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.read(spark, dir, "embeddings")
    val n = e.count()
    val auto = Similarity.autoCells(e)
    val cellCounts =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, auto)
    // r14 axis: Lloyd refinement of the coarse quantizer (the graph
    // tier's entry-quality treatment applied to the IVF sibling) —
    // "raw" = the first-`cells` vectors, an integer = kmeansCentroids
    // iterations over that seed
    val lloyds = sys.env.getOrElse("SPARK_GRAFT_LLOYD", "raw")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    println(s"[ivfsweep] dir=$dir n=$n autoCells=$auto lloyd=$lloyds")
    val truth = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 10)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    for (cells <- cellCounts; ll <- lloyds; probe <- Seq(1, 2, 3, 4, 8)
         if probe <= cells) {
      val cent = ll match {
        case "raw" => e.filter(col("vec_id") < cells)
        case it => Similarity.lloydCentroidDf(e, cells, it.toInt)
          .localCheckpoint()
      }
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val approx = Similarity
          .ivfTopK(e, e.filter(col("vec_id") < 10), cent, probe, 10)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        val recall = truth.join(approx, Seq("q_id", "vec_id"), "left")
          .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
          .head.getDouble(0)
        (recall, (System.nanoTime() - t0) / 1e9)
      }
      once() // warm
      val (recall, sec) = once()
      println(f"[ivfsweep] cells=$cells%4d lloyd=$ll%3s probe=$probe%2d " +
        f"recall_at_10=$recall%.4f sec=$sec%.2f")
    }
    spark.stop()
  }
}
