package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc NN-Descent round-count pricing (not a driver contract):
  * for each round count, the measured build seconds and recall@5 of
  * the graph's top-5 slice against the brute-force truth — the table
  * that says whether another wedge-join round is worth its cost.
  * Args: round counts (default: 2 3 4).
  */
object NndSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rounds = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 3, 4)
    val e = graft.core.Tables.read(spark, dir, "embeddings")
    val cent = e.filter(col("vec_id") <
      graft.operators.Similarity.autoCells(e))
    val truth = graft.operators.Similarity.bruteForceTopK(e, e, 5)
      .select(col("q_id").as("vec_id"), col("vec_id").as("nb_id"))
      .localCheckpoint()
    rounds.foreach { r =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .knnGraph(e, cent, 10, r)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val sec = math.min(once(), once())
      val g = graft.operators.Similarity
        .knnGraph(e, cent, 10, r)
        .filter(col("rn") <= 5)
        .select(col("vec_id"), col("nb_id"), lit(1).as("hit"))
      val recall = truth.join(g, Seq("vec_id", "nb_id"), "left")
        .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
        .head.getDouble(0)
      println(f"[nnd] rounds=$r%d sec=$sec%.2f recall_at_5=$recall%.4f")
    }
    spark.stop()
  }
}
