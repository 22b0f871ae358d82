package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc PPJoin stage probe (not a driver contract): candidate-pair
  * count and wall seconds for the candidate stage vs the full verify,
  * per SF dir — the decomposition that says whether a decade-2
  * elevation is candidate VOLUME (the prefix/position filters' df²
  * exposure) or verify cost (the pair-scoped shingle re-join).
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.read(spark, dir, "documents")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (nDocs, _) = timed(docs.count())
    val (cand, tCand) =
      timed(graft.operators.Dedup.ppjoinCandidates(docs, 3, 0.6).count())
    val (pairs, tFull) =
      timed(graft.operators.Dedup.ppjoin(docs, 3, 0.6).count())
    println(f"[ppjoin] dir=$dir docs=$nDocs candidates=$cand " +
      f"cand_sec=$tCand%.2f pairs=$pairs full_sec=$tFull%.2f")
    spark.stop()
  }
}
