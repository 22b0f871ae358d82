package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.IvfPqServeStream
import graft.streaming.IvfStream.Vec

/** Online IVFPQ serving: streaming answers are the batch probe's
  * answers bit-for-bit with BOTH trained components (stored coarse
  * quantizer + stored PQ codebooks) resolved from the layout,
  * invariant to batch boundaries, and a mid-stream rebuild — which
  * retrains both components — rotates atomically under the shared
  * version machinery.
  */
class IvfPqServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def booksFor(iters: Int): Similarity.Books =
    Similarity.pqTrainBooks(emb, emb.filter(col("vec_id") < 16), 16, iters)

  private lazy val indexPath = {
    val p = "target/atrest/ivfpq-servestream"
    Similarity.ivfPqWriteIndex(emb, Similarity.lloydCentroidDf(emb, 8, 1),
      booksFor(1), p)
    p
  }

  private def queryVecs(n: Int): Seq[Vec] = emb
    .filter(col("vec_id") < n)
    .select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")))
    .collect()
    .map(r => Vec(r.getLong(0), r.getSeq[Double](1)))
    .toSeq

  private def run(batches: Seq[Seq[Vec]]): Set[(Long, Long, Double, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-pqserve-out").toString
    val q = IvfPqServeStream.start(spark, input.toDF(), indexPath, outDir,
      Files.createTempDirectory("graft-pqserve-ckpt").toString,
      nProbe = 2, k = 10)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("streaming answers equal the batch probe bit-for-bit (stored books + quantizer)") {
    val got = run(Seq(queryVecs(5)))
    val direct = Similarity.ivfPqTopKAtRest(spark, s"$indexPath/codes",
        emb.filter(col("vec_id") < 5),
        Similarity.ivfStoredCentroids(spark, indexPath),
        Similarity.ivfPqStoredBooks(spark, indexPath), nProbe = 2, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === direct)
    assert(got.nonEmpty)
  }

  test("answers are batch-split invariant, and an empty trigger appends nothing") {
    val vecs = queryVecs(6)
    val oneBatch = run(Seq(vecs))
    val split = run(Seq(vecs.take(2), Seq.empty, vecs.drop(2)))
    assert(split === oneBatch,
      "the probe depends only on the query and the immutable index")
  }

  test("a rebuild retraining BOTH components rotates atomically mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-pqserve-vroot").toString
    assert(Similarity.graphCurrentVersion(spark, root).isEmpty)
    val v0 = Similarity.ivfPqPublishVersion(emb,
      Similarity.lloydCentroidDf(emb, 8, 1), booksFor(1), root)
    assert(v0 === 0)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-pqserve-vout").toString
    val q = IvfPqServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-pqserve-vckpt").toString,
      nProbe = 2, k = 10)
    val vecs = queryVecs(5)
    try {
      input.addData(vecs: _*); q.processAllAvailable()
      // rebuild with a different quantizer (4 cells) AND different
      // codebooks (untrained seed) lands mid-stream — the next batch
      // must probe AND score under the new version's own models
      val v1 = Similarity.ivfPqPublishVersion(emb,
        Similarity.lloydCentroidDf(emb, 4, 0), booksFor(0), root)
      assert(v1 === 1)
      assert(Similarity.graphCurrentVersion(spark, root) === Some(1))
      input.addData(vecs: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
    val sets = out.groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("approx_dot"), r.getAs[Int]("rn"))).toSet
      }
    assert(sets.keySet === Set(0, 1), "both versions must have served")
    def direct(v: Int): Set[(Long, Long, Double, Int)] = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.ivfPqTopKAtRest(spark, s"$p/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, p),
          Similarity.ivfPqStoredBooks(spark, p), nProbe = 2, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    assert(sets(0) === direct(0))
    assert(sets(1) === direct(1))
    assert(sets(0) !== sets(1),
      "rebuild with different models should change some answer")
    // stored models differ per version — serving never retrained
    assert(Similarity.ivfStoredCentroids(spark,
      Similarity.graphVersionPath(root, 0)).count() === 8L)
    assert(Similarity.ivfStoredCentroids(spark,
      Similarity.graphVersionPath(root, 1)).count() === 4L)
    val b0 = Similarity.ivfPqStoredBooks(spark,
      Similarity.graphVersionPath(root, 0))
    val b1 = Similarity.ivfPqStoredBooks(spark,
      Similarity.graphVersionPath(root, 1))
    assert(b0.flatten.map(_._2.toSeq) !== b1.flatten.map(_._2.toSeq),
      "the two versions' codebooks must actually differ")
  }
}
