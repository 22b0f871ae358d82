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

  test("a corpus doubling triggers a rebuild recommendation at the NEW autoCells count") {
    implicit val sqlCtx = spark.sqlContext
    // layout built at n=100 → autoCells(100)=10 entry cells
    val builtN = 100L
    val builtCells = graft.operators.Similarity.autoCellsOf(builtN)
    assert(builtCells === 10)
    val input = MemoryStream[Vec]
    val q = IvfStream.rebuildSignal(input.toDS(), builtN, builtCells)
      .writeStream.format("memory").queryName("ivf_rebuild")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ivf-rb-ckpt").toString)
      .start()
    def signals() = {
      q.processAllAvailable()
      spark.table("ivf_rebuild").as[IvfStream.RebuildSignal]
        .collect().sortBy(_.corpus_n).toSeq
    }
    def vecs(ids: Range) = ids.map(i => Vec(i.toLong, Seq(i.toDouble, 1.0)))
    try {
      // +60 arrivals: corpus 160 < 2×100 — watch, don't rebuild
      input.addData(vecs(0 until 60): _*)
      val s1 = signals().last
      assert(s1.corpus_n === 160L && !s1.rebuild,
        s"premature rebuild at $s1")
      // +40 more: corpus 200 = 2×100 — rebuild, and AT THE NEW COUNT
      input.addData(vecs(60 until 100): _*)
      val s2 = signals().last
      assert(s2.corpus_n === 200L && s2.rebuild, s"missed doubling at $s2")
      assert(s2.auto_cells ===
        graft.operators.Similarity.autoCellsOf(200L) &&
        s2.auto_cells > builtCells,
        "the recommendation must carry the grown corpus's cell count")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivf_rebuild")
    }
  }

  test("the rebuild recommendation drives the versioned publish path end to end") {
    // the wiring the drift monitor exists for: signal says (rebuild,
    // auto_cells) → a batch job publishes a fresh version with that
    // many entry centroids → readers resolve it atomically
    val emb = graft.core.Tables.read(spark, sf, "embeddings")
    val n = emb.count()
    val rec = graft.operators.Similarity.autoCellsOf(2 * n)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-rb-pub").toString
    val v = graft.operators.Similarity.graphPublishVersion(
      emb, emb.filter(col("vec_id") < rec), 10, 0, root)
    val p = graft.operators.Similarity.graphVersionPath(root, v)
    val meta = spark.read.parquet(s"$p/meta").head
    assert(meta.getAs[Int]("cells") === rec,
      "the published layout must record the recommended cell count")
    assert(meta.getAs[Long]("built_n") === n)
  }
}
