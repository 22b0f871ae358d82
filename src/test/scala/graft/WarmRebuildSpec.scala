package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.GraphServeStream
import graft.streaming.IvfStream.Vec

/** Warm-start graph rebuild under the version-rotation machinery: a
  * drift-triggered rebuild seeded from the previous version's
  * neighbor lists ([[graft.operators.Similarity
  * .graphPublishVersionWarm]]) publishes a layout format-identical to
  * a cold build's — serving rotates to it atomically and answers it
  * bit-identically to a direct batch probe of the same layout, so the
  * warm path changes ONLY the build cost (WarmSweep prices that), not
  * one serving invariant.
  */
class WarmRebuildSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  private lazy val cent = Similarity.lloydCentroidDf(emb, 8, 1)

  test("warm publish falls back to a cold build when no version exists") {
    val root = Files.createTempDirectory("graft-warm-first").toString
    val v = Similarity.graphPublishVersionWarm(base, cent, 10, root)
    assert(v === 0)
    assert(Similarity.graphCurrentVersion(spark, root) === Some(0))
  }

  test("a warm rebuild carries old neighborhoods, seeds new nodes, and serves as a normal version") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-warm-root").toString
    val v0 = Similarity.graphPublishVersion(base, cent, 10, 3, root)
    assert(v0 === 0)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-warm-out").toString
    val q = GraphServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-warm-ckpt").toString,
      beam = 20, rounds = 4, k = 10)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")))
      .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1))).toSeq
    try {
      input.addData(queries: _*); q.processAllAvailable()
      // the corpus grew; the drift rebuild runs WARM and rotates in
      val v1 = Similarity.graphPublishVersionWarm(emb, cent, 10, root,
        warmRounds = 1)
      assert(v1 === 1)
      input.addData(queries: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
    val byVersion = out.groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
      }
    assert(byVersion.keySet === Set(0, 1), "both versions must have served")
    // serve twin: the rotated stream's v1 answers ARE the direct
    // batch probe of the warm layout, bit for bit
    val p1 = Similarity.graphVersionPath(root, 1)
    val direct = Similarity.graphTopKAtRest(spark, p1,
        emb.filter(col("vec_id") < 5),
        Similarity.graphStoredCentroids(spark, p1),
        beam = 20, rounds = 4, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(byVersion(1) === direct)
    // the warm layout actually contains the grown corpus: every delta
    // node is present in nodes AND has an adjacency list
    val deltaIds = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val nodeIds = spark.read.parquet(s"$p1/nodes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(deltaIds.subsetOf(nodeIds))
    val srcIds = spark.read.parquet(s"$p1/adj")
      .select(col("src")).distinct().collect().map(_.getLong(0)).toSet
    assert(deltaIds.subsetOf(srcIds),
      "every new node must be wired into the warm graph")
    // and old neighborhoods were CARRIED, not re-derived: with zero
    // descent rounds the warm graph's base-node lists come from v0's
    // lists (re-scored, re-ranked with the new nodes' seeds mixed in)
    // — at minimum the warm edge set must overlap v0 heavily
    val v0Adj = spark.read.parquet(
        s"${Similarity.graphVersionPath(root, 0)}/adj")
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val v1Adj = spark.read.parquet(s"$p1/adj")
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val carried = v0Adj.count(v1Adj)
    assert(carried.toDouble / v0Adj.size > 0.5,
      s"warm build should retain most prior edges (kept $carried of ${v0Adj.size})")
  }
}
