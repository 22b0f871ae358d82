package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc mm_resize_real stage probe (not a driver contract): wall
  * seconds and per-row nanoseconds for each codec stage of the
  * resize pipeline — (1) PNG encode (syntheticPngs), (2) encode +
  * decode/rescale/re-encode (resizeMedia), (3) the full declared
  * query (+ final decodeImages) — per SF dir. Run at two decades,
  * the decomposition says whether the decade-2 elevation is
  * irreducible per-row codec CPU (per-row ns flat across decades —
  * document it) or a batch effect (per-row ns growing with the
  * corpus — fix it).
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.read(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val n = docs.count()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      f
      val s2 = (System.nanoTime() - t1) / 1e9
      val best = math.min(s1, s2)
      println(f"[mm] dir=$dir rows=$n stage=$label%-12s sec=$best%.2f " +
        f"ns_per_row=${best * 1e9 / n}%.0f")
    }
    def noop(ds: org.apache.spark.sql.DataFrame): Unit =
      ds.write.format("noop").mode("overwrite").save()
    timed("encode") {
      noop(graft.operators.Multimodal.syntheticPngs(docs).toDF())
    }
    timed("resize") {
      noop(graft.operators.Multimodal.resizeMedia(
        graft.operators.Multimodal.syntheticPngs(docs), 16, 16, 4).toDF())
    }
    timed("full") {
      val resized = graft.operators.Multimodal.resizeMedia(
        graft.operators.Multimodal.syntheticPngs(docs), 16, 16, 4)
      noop(graft.operators.Multimodal.decodeImages(
          resized.map(r =>
            graft.operators.Multimodal.MediaRow(
              r.media_id, "image", r.content, 1)))
        .toDF().select(col("media_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b")))
    }
    spark.stop()
  }
}
