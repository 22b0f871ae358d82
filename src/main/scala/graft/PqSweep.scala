package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc raw-vs-residual IVFPQ pricing (not a driver contract; the
  * r14 verdict's Next #6): FAISS IVFPQ quantizes RESIDUALS (x − cell
  * centroid), not raw sub-vectors — at equal m/probe it is the
  * standard recall lever, because residual magnitudes are smaller so
  * the same code budget spends itself on the unexplained part of the
  * vector. This sweep measures recall@10 against the brute-force
  * truth plus train and serve wall for both encodings on the declared
  * IVFPQ axes (m = 16, iters = 2, ⌈√n⌉ raw-seed cells, probe ∈
  * {1, 2, 4}); the declared queries adopt whichever wins at equal
  * serve cost, with the sweep recorded in COVERAGE.md.
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.read(spark, dir, "embeddings")
    val n = e.count()
    val cells = Similarity.autoCellsOf(n)
    val queries = e.filter(col("vec_id") < 10)
    // quantizer axis (the IvfSweep convention): "raw" = first-⌈√n⌉
    // seeds (the declared IVFPQ config), an integer = Lloyd rounds —
    // residual encoding's whole premise is a quantizer good enough
    // that ||x − c(x)|| ≪ ||x||, which raw seeds are not
    val lloyds = sys.env.getOrElse("SPARK_GRAFT_LLOYD", "raw,1,3")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    println(s"[pqsweep] dir=$dir n=$n cells=$cells m=16 iters=2")
    val truth = Similarity.bruteForceTopK(e, queries, 10)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    // r16: the "opq" arm — the post-residual recall lever (Ge et al.
    // OPQ, parametric/eigenvalue-allocation form): an ORTHOGONAL
    // rotation balances subspace variance before PQ; dots (hence cell
    // assignment and the truth) are exactly preserved, so the arm
    // reuses the raw scorer on the rotated relations with rotated
    // centroids
    val encs = sys.env.getOrElse("SPARK_GRAFT_ENCS", "raw,residual,opq")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    lazy val (rot, eRot, rotSec) = {
      val t0 = System.nanoTime()
      val r = Similarity.opqParametricRotation(e, 16)
      val er = Similarity.rotated(e, r).localCheckpoint()
      er.count() // force the rotation pass into the measured window
      (r, er, (System.nanoTime() - t0) / 1e9)
    }
    for (ll <- lloyds; enc <- encs) {
      val cent0 = (ll match {
        case "raw" => e.filter(col("vec_id") < cells)
        case it => Similarity.lloydCentroidDf(e, cells, it.toInt)
      }).localCheckpoint()
      val cent = if (enc == "opq")
        Similarity.rotated(cent0, rot).localCheckpoint() else cent0
      val tTrain0 = System.nanoTime()
      val books = enc match {
        case "raw" =>
          Similarity.pqTrainBooks(e, e.filter(col("vec_id") < 16), 16, 2)
        case "opq" =>
          Similarity.pqTrainBooks(eRot,
            eRot.filter(col("vec_id") < 16), 16, 2)
        case _ =>
          Similarity.pqTrainBooksResidual(e, cent, seedK = 16, 16, 2)
      }
      val trainSec = (System.nanoTime() - tTrain0) / 1e9 +
        (if (enc == "opq") rotSec else 0.0)
      // mean relative reconstruction error of what the codes encode
      // (raw: the vector; residual: the residual; opq: the rotated
      // vector) — the variance the code budget is spending itself on
      val distCorpus = enc match {
        case "raw" => e
        case "opq" => eRot
        case _ => Similarity.residuals(e, cent0)
      }
      val dist = Similarity.pqDistortionWith(distCorpus, books)
        .agg(avg(col("rel_dist2"))).head.getDouble(0)
      for (probe <- Seq(1, 2, 4)) {
        def once(): (Double, Double) = {
          val t0 = System.nanoTime()
          val approx = (enc match {
            case "raw" =>
              Similarity.ivfPqTopKWith(e, queries, cent, books, probe, 10)
            case "opq" =>
              Similarity.ivfPqTopKWith(eRot,
                Similarity.rotated(queries, rot), cent, books, probe, 10)
            case _ => Similarity
              .ivfPqResidualTopKWith(e, queries, cent, books, probe, 10)
          }).select(col("q_id"), col("vec_id"), lit(1).as("hit"))
          val recall = truth.join(approx, Seq("q_id", "vec_id"), "left")
            .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
            .head.getDouble(0)
          (recall, (System.nanoTime() - t0) / 1e9)
        }
        once() // warm
        val (recall, sec) = once()
        println(f"[pqsweep] lloyd=$ll%3s enc=$enc%8s probe=$probe%2d " +
          f"recall_at_10=$recall%.4f serve_sec=$sec%.2f " +
          f"train_sec=$trainSec%.2f rel_dist2=$dist%.4f " +
          f"load=${BenchEnv.load1()}%.2f")
      }
    }
    spark.stop()
  }
}
