package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.{GraphServeStream, IvfPqServeStream}
import graft.streaming.IvfStream.Vec

/** The combined serving stress: rotation + append + replay exercised
  * in ONE stream per tier. Rotation and replay pinning were pinned
  * separately before (IvfPqServeStreamSpec, GraphServeStreamSpec);
  * the interaction is the surface this suite covers — a batch's
  * answers are pinned to the (version, epoch) that first served it,
  * no batch mixes models, an append inside a version is visible to
  * the NEXT batch but never to a replay of an earlier one, and a
  * rebuild resets the epoch clock without orphaning earlier pins.
  */
class ServeStressSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  private lazy val delta = emb.filter(col("vec_id") % 5 === 0)

  private def queryVecs(n: Int): Seq[Vec] = emb
    .filter(col("vec_id") < n)
    .select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")))
    .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1))).toSeq

  test("IVFPQ tier: publish v0, serve, append, serve, rebuild v1, serve — every batch pinned, no model mixing") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-stress-root").toString
    val outDir = Files.createTempDirectory("graft-stress-out").toString
    val books = Similarity.pqTrainBooks(emb,
      emb.filter(col("vec_id") < 16), 16, 1)
    val cent = Similarity.lloydCentroidDf(emb, 8, 1).localCheckpoint()
    assert(Similarity.ivfPqPublishVersion(base, cent, books, root) === 0)
    val input = MemoryStream[Vec]
    val q = IvfPqServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-stress-ckpt").toString,
      nProbe = 2, k = 10)
    val vecs = queryVecs(5)
    try {
      // batch 0: v0 epoch 0
      input.addData(vecs: _*); q.processAllAvailable()
      // the corpus grows INSIDE v0 — no rotation
      val v0path = Similarity.graphVersionPath(root, 0)
      assert(Similarity.ivfPqAppendDelta(delta, v0path) === 1L)
      // batch 1: v0 epoch 1 — sees the appended vectors
      input.addData(vecs: _*); q.processAllAvailable()
      // a full rebuild (different quantizer: 4 cells; retrained books)
      // publishes v1 — epoch clock resets to 0
      val books1 = Similarity.pqTrainBooks(emb,
        emb.filter(col("vec_id") < 16), 16, 0)
      assert(Similarity.ivfPqPublishVersion(emb,
        Similarity.lloydCentroidDf(emb, 4, 0), books1, root) === 1)
      // batch 2: v1 epoch 0
      input.addData(vecs: _*); q.processAllAvailable()
    } finally q.stop()

    // every batch's pin is the (version, epoch) that first served it —
    // a replay of ANY batch re-resolves nothing
    def pin(b: Long): String =
      GraphServeStream.pinnedRecord(spark, outDir, b,
        fail(s"replay of batch $b must not re-resolve"))
    assert(pin(0L) === "0:0")
    assert(pin(1L) === "0:1")
    assert(pin(2L) === "1:0")

    // and the served rows are exactly the three pinned states' direct
    // probes — no batch mixed models or saw another batch's epoch
    def direct(v: Int, e: Long): Set[(Long, Long, Double, Int)] = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.ivfPqTopKAtRest(spark, s"$p/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, p),
          Similarity.ivfPqStoredBooks(spark, p), nProbe = 2, k = 10,
          maxEpoch = e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    val out = spark.read.parquet(outDir).collect()
    val byVersion = out.groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("approx_dot"), r.getAs[Int]("rn"))).toSet
      }
    assert(byVersion.keySet === Set(0, 1))
    assert(byVersion(0) === (direct(0, 0L) ++ direct(0, 1L)),
      "v0 rows must be exactly the epoch-0 plus epoch-1 probes")
    assert(byVersion(1) === direct(1, 0L))
    // the append actually changed v0's answers (epoch 1 found delta
    // vectors) and the rebuild changed them again
    assert(direct(0, 0L) !== direct(0, 1L),
      "fixture degenerate: the append changed no answer")
    val deltaIds = delta.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    assert(direct(0, 1L).exists(t => deltaIds(t._2)))
    assert(!direct(0, 0L).exists(t => deltaIds(t._2)))
  }

  test("graph tier: serve, append mid-stream, serve, warm rebuild, serve — every batch pinned, no model mixing") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-stress-groot").toString
    val outDir = Files.createTempDirectory("graft-stress-gout").toString
    val cent = Similarity.lloydCentroidDf(emb, 8, 1).localCheckpoint()
    assert(Similarity.graphPublishVersion(base, cent, 10, 3, root) === 0)
    val input = MemoryStream[Vec]
    val q = GraphServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-stress-gckpt").toString,
      beam = 20, rounds = 4, k = 10)
    val vecs = queryVecs(5)
    try {
      // batch 0: v0 epoch 0
      input.addData(vecs: _*); q.processAllAvailable()
      // the corpus grows INSIDE v0 — insertion-by-search, no rotation
      val v0path = Similarity.graphVersionPath(root, 0)
      assert(Similarity.graphAppendDelta(delta, v0path) === 1L)
      // batch 1: v0 epoch 1 — walks the grown graph
      input.addData(vecs: _*); q.processAllAvailable()
      // drift beyond growth: the WARM rebuild publishes v1 — the
      // epoch clock resets to 0
      assert(Similarity.graphPublishVersionWarm(emb, cent, 10, root,
        warmRounds = 1) === 1)
      // batch 2: v1 epoch 0
      input.addData(vecs: _*); q.processAllAvailable()
    } finally q.stop()
    // every batch's pin is the (version, epoch) that first served it
    def pin(b: Long): String =
      GraphServeStream.pinnedRecord(spark, outDir, b,
        fail(s"replay of batch $b must not re-resolve"))
    assert(pin(0L) === "0:0")
    assert(pin(1L) === "0:1")
    assert(pin(2L) === "1:0")
    val out = spark.read.parquet(outDir).collect()
    val byVersion = out.groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
      }
    def direct(v: Int, e: Long): Set[(Long, Long, Double, Int)] = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.graphTopKAtRest(spark, p, emb.filter(col("vec_id") < 5),
          Similarity.graphStoredCentroids(spark, p),
          beam = 20, rounds = 4, k = 10, maxEpoch = e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    assert(byVersion.keySet === Set(0, 1))
    assert(byVersion(0) === (direct(0, 0L) ++ direct(0, 1L)),
      "v0 rows must be exactly the epoch-0 plus epoch-1 walks")
    assert(byVersion(1) === direct(1, 0L))
    // the append actually changed v0's answers: inserted nodes are
    // findable at epoch 1, invisible at the epoch-0 pin
    assert(direct(0, 0L) !== direct(0, 1L),
      "fixture degenerate: the append changed no answer")
    val deltaIds = delta.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    assert(direct(0, 1L).exists(t => deltaIds(t._2)))
    assert(!direct(0, 0L).exists(t => deltaIds(t._2)))
  }
}
