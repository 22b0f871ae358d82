package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.IvfServeStream
import graft.streaming.IvfStream.Vec

/** Online IVF serving: streaming answers are the batch probe's
  * answers bit-for-bit (stored quantizer, same pruned reads),
  * invariant to batch boundaries, and a mid-stream rebuild rotates
  * atomically under the shared version machinery.
  */
class IvfServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val indexPath = {
    val p = "target/atrest/ivf-servestream"
    Similarity.ivfWriteIndex(emb, Similarity.lloydCentroidDf(emb, 8, 1), p)
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
    val outDir = Files.createTempDirectory("graft-ivfserve-out").toString
    val q = IvfServeStream.start(spark, input.toDF(), indexPath, outDir,
      Files.createTempDirectory("graft-ivfserve-ckpt").toString,
      nProbe = 2, k = 10)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("streaming answers equal the batch probe bit-for-bit") {
    val got = run(Seq(queryVecs(5)))
    val direct = Similarity.ivfTopKAtRest(spark, s"$indexPath/codes",
        emb.filter(col("vec_id") < 5),
        Similarity.ivfStoredCentroids(spark, indexPath),
        nProbe = 2, k = 10)
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

  test("a rebuild published mid-stream rotates answers atomically") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ivfserve-vroot").toString
    assert(Similarity.graphCurrentVersion(spark, root).isEmpty)
    val v0 = Similarity.ivfPublishVersion(emb,
      Similarity.lloydCentroidDf(emb, 8, 1), root)
    assert(v0 === 0)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-ivfserve-vout").toString
    val q = IvfServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-ivfserve-vckpt").toString,
      nProbe = 2, k = 10)
    val vecs = queryVecs(5)
    try {
      input.addData(vecs: _*); q.processAllAvailable()
      // rebuild with a DIFFERENT quantizer (4 cells, no refinement)
      // lands mid-stream — the next batch must probe under it
      val v1 = Similarity.ivfPublishVersion(emb,
        Similarity.lloydCentroidDf(emb, 4, 0), root)
      assert(v1 === 1)
      assert(Similarity.graphCurrentVersion(spark, root) === Some(1))
      input.addData(vecs: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
    val sets = out.groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
      }
    assert(sets.keySet === Set(0, 1), "both versions must have served")
    def direct(v: Int): Set[(Long, Long, Double, Int)] = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.ivfTopKAtRest(spark, s"$p/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, p), nProbe = 2, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    assert(sets(0) === direct(0))
    assert(sets(1) === direct(1))
    // the two quantizers must actually disagree somewhere, or the
    // rotation assertion is vacuous
    assert(sets(0) !== sets(1),
      "rebuild with a different quantizer should change some answer")
    // stored quantizers differ per version — serving never retrained
    assert(Similarity.ivfStoredCentroids(spark,
      Similarity.graphVersionPath(root, 0)).count() === 8L)
    assert(Similarity.ivfStoredCentroids(spark,
      Similarity.graphVersionPath(root, 1)).count() === 4L)
  }

  test("vectors appended mid-stream are served by the next batch; replays stay epoch-pinned") {
    implicit val sqlCtx = spark.sqlContext
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val path = Files.createTempDirectory("graft-ivfserve-app").toString
    Similarity.ivfWriteIndex(base, Similarity.lloydCentroidDf(emb, 8, 1),
      path)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-ivfserve-appout").toString
    val q = IvfServeStream.start(spark, input.toDF(), path, outDir,
      Files.createTempDirectory("graft-ivfserve-appckpt").toString,
      nProbe = 2, k = 10)
    val vecs = queryVecs(5)
    try {
      input.addData(vecs: _*); q.processAllAvailable()
      // the corpus grows mid-stream: no rebuild, no rotation
      assert(Similarity.ivfAppendDelta(delta, path) === 1L)
      input.addData(vecs: _*); q.processAllAvailable()
    } finally q.stop()
    def direct(e: Long): Set[(Long, Long, Double, Int)] =
      Similarity.ivfTopKAtRest(spark, s"$path/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, path), nProbe = 2, k = 10,
          maxEpoch = e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    // batch 0 served at epoch 0, batch 1 at epoch 1 — and the second
    // batch found appended vectors
    assert(out === (direct(0L) ++ direct(1L)))
    val deltaIds = delta.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    assert(direct(1L).exists(t => deltaIds(t._2)))
    assert(!direct(0L).exists(t => deltaIds(t._2)))
    // replay pins survive the growth: neither batch re-resolves
    import graft.streaming.GraphServeStream
    assert(GraphServeStream.pinnedRecord(spark, outDir, 0L,
      fail("replay must not re-resolve")) === "0")
    assert(GraphServeStream.pinnedRecord(spark, outDir, 1L,
      fail("replay must not re-resolve")) === "1")
  }
}
