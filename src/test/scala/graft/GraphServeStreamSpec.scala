package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.GraphServeStream
import graft.streaming.IvfStream.Vec

/** Online graph-ANN serving: the streaming answers are the batch
  * operator's answers bit-for-bit (same walk, same immutable index),
  * invariant to batch boundaries, and a quiet trigger appends
  * nothing.
  */
class GraphServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val cent = emb.filter(col("vec_id") < 8)

  private lazy val indexPath = {
    val p = "target/atrest/graph-servestream"
    Similarity.graphWriteAtRest(emb, cent, 10, 2, p)
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
    val outDir = Files.createTempDirectory("graft-serve-out").toString
    val q = GraphServeStream.start(spark, input.toDF(), indexPath, cent,
      outDir, Files.createTempDirectory("graft-serve-ckpt").toString,
      beam = 6, rounds = 2, k = 10)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("streaming answers equal the batch walk bit-for-bit") {
    val got = run(Seq(queryVecs(5)))
    val direct = Similarity.graphTopKAtRest(spark, indexPath,
        emb.filter(col("vec_id") < 5), cent, beam = 6, rounds = 2, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === direct)
  }

  test("answers are batch-split invariant, and an empty trigger appends nothing") {
    val vecs = queryVecs(6)
    val oneBatch = run(Seq(vecs))
    val split = run(Seq(vecs.take(2), Seq.empty, vecs.drop(2)))
    assert(split === oneBatch,
      "the walk depends only on the query and the immutable index")
  }
}
