package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.IvfStream
import graft.streaming.IvfStream.{CellCount, Vec}

/** Streaming IVF cell monitor: count-table equality with the batch
  * cell-balance audit on the same vectors (the assignment rules must
  * never disagree), batch-split invariance, and running-count carry.
  */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(batches: Seq[Seq[Vec]],
                  cent: Seq[(Int, Array[Double])]): Map[Int, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = IvfStream.cellCounts(input.toDS(), cent)
      .writeStream.format("memory").queryName("ivf_out")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ivf-ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("ivf_out").as[CellCount].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS ivf_out")
    rows.groupBy(_.cell).map { case (c, rs) => c -> rs.map(_.n_vecs).max }
  }

  test("streaming cell counts equal the batch cell-balance audit on real vectors") {
    val emb = graft.core.Tables.read(spark, sf, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
    val cent = centroids
      .select(col("vec_id").cast("int"),
        graft.functions.VectorFunctions.asDouble(col("embedding")))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
      .sortBy(_._1)
    val vecs = emb
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")))
      .collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    val got = run(Seq(vecs), cent)
    val batch = graft.operators.Similarity.ivfCellBalance(emb, centroids)
      .collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n_vecs")).toMap
    assert(got === batch,
      s"streaming $got vs batch $batch — assignment rules diverged")
  }

  test("counts are batch-split invariant and carry across triggers") {
    val cent = Seq(
      0 -> Array(1.0, 0.0),
      1 -> Array(0.0, 1.0))
    val vecs = (1 to 90).map { i =>
      // thirds: cell 0, cell 1, and a tie (equal dots) -> cell 0
      val v = i % 3 match {
        case 0 => Seq(1.0, 0.1)
        case 1 => Seq(0.1, 1.0)
        case _ => Seq(0.5, 0.5)
      }
      Vec(i.toLong, v)
    }
    val one = run(Seq(vecs), cent)
    val three = run(Seq(vecs.grouped(30).toSeq: _*), cent)
    assert(one === three)
    assert(one(0) === 60L && one(1) === 30L) // ties to the smaller id
  }

  test("assign fails loud on a dimension mismatch") {
    val cent = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val ex = intercept[IllegalArgumentException] {
      IvfStream.assign(Seq(1.0), cent) // truncated vector
    }
    assert(ex.getMessage.contains("dim"))
  }
}
