package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.{GraphServeStream, IvfPqServeStream, IvfServeStream}
import graft.streaming.IvfStream
import graft.streaming.IvfStream.Vec

/** The composed index-maintenance loop, end to end on the IVF and
  * IVFPQ tiers — the three separately-spec'd pieces running as ONE
  * deployment: [[IvfStream.rebuildSignal]] watches growth and decides
  * WHEN a version rotation (at the new ⌈√n⌉ cell budget) is due;
  * below the threshold [[Similarity.ivfFreshen]] takes the
  * incremental path (append inside the current version, epoch bump);
  * at the threshold a fresh version publishes and serving rotates —
  * and through BOTH transitions the serve stream pins one
  * `version:epoch` per batch, so every batch's rows equal the direct
  * probe at its pinned state and a checkpoint replay re-resolves
  * nothing.
  */
class FreshenLoopSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  // frontier split (the append-only ingest shape freshen's growth
  // detection requires): built at 400, grown in two 50-row deltas
  private lazy val base = emb.filter(col("vec_id") < 400)
  private lazy val grown450 = emb.filter(col("vec_id") < 450)

  private def queryVecs: Seq[Vec] = emb.filter(col("vec_id") < 5)
    .select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")))
    .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1))).toSeq

  /** Drive [[IvfStream.rebuildSignal]] with the arriving delta and
    * return the final recommendation — the monitor's decision.
    */
  private def signalAfter(name: String, builtN: Long, builtCells: Int,
                          arrivals: Seq[Vec]): IvfStream.RebuildSignal = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = IvfStream.rebuildSignal(input.toDS(), builtN, builtCells,
        factor = 1.2)
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-$name-ckpt").toString)
      .start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      spark.table(name).as[IvfStream.RebuildSignal]
        .collect().maxBy(_.corpus_n)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name"); ()
    }
  }

  private def deltaVecs(df: DataFrame): Seq[Vec] = df
    .select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")))
    .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1))).toSeq

  /** One maintenance step of the composed policy: the monitor's
    * verdict picks rotation-at-new-cell-count vs the freshen
    * convenience (append on pure growth). Returns what happened.
    */
  private def maintain(corpus: DataFrame, root: String,
                       signal: IvfStream.RebuildSignal,
                       publish: (DataFrame, Int) => Int,
                       append: DataFrame => Unit): String =
    if (signal.rebuild) {
      publish(corpus, signal.auto_cells); "republished"
    } else {
      val v = Similarity.graphCurrentVersion(spark, root).get
      Similarity.ivfFreshen(corpus, Similarity.graphVersionPath(root, v),
        rebuild = c => { publish(c, signal.auto_cells); () },
        append = append)
    }

  test("IVF tier: watch -> freshen-append -> threshold -> rotate, every batch pinned") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-floop-root").toString
    val outDir = Files.createTempDirectory("graft-floop-out").toString
    val builtCells = Similarity.autoCells(base)
    def publish(c: DataFrame, cells: Int): Int =
      Similarity.ivfPublishVersion(c,
        Similarity.lloydCentroidDf(c, cells, 1), root)
    assert(publish(base, builtCells) === 0)

    val input = MemoryStream[Vec]
    val q = IvfServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-floop-ckpt").toString,
      nProbe = 3, k = 10)
    try {
      // batch 0 serves v0:0
      input.addData(queryVecs: _*); q.processAllAvailable()

      // +50 arrivals: 450 < 1.2×400 — the monitor says watch, the
      // freshen convenience takes the APPEND path inside v0
      val d1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      val s1 = signalAfter("floop_ivf_s1", 400L, builtCells, deltaVecs(d1))
      assert(!s1.rebuild, s"premature rotation at $s1")
      assert(maintain(grown450, root, s1, publish,
        d => { Similarity.ivfAppendDelta(d,
          Similarity.graphVersionPath(root, 0)); () }) === "appended")
      assert(Similarity.indexEpoch(spark,
        Similarity.graphVersionPath(root, 0)) === 1L)

      // batch 1 serves v0:1 — the appended vectors are findable
      input.addData(queryVecs: _*); q.processAllAvailable()

      // +50 more: 500 ≥ 1.2×400 — the monitor (whose reference stays
      // the BUILD size: appends never retrain the cell budget) fires,
      // and the rotation rebuilds AT THE RECOMMENDED cell count
      val d2 = emb.filter(col("vec_id") >= 450)
      val s2 = signalAfter("floop_ivf_s2", 400L, builtCells,
        deltaVecs(d1) ++ deltaVecs(d2))
      assert(s2.rebuild && s2.auto_cells ===
        Similarity.autoCellsOf(500L), s"missed threshold at $s2")
      assert(maintain(emb, root, s2, publish, _ => fail(
        "a fired signal must rotate, not append")) === "republished")
      assert(Similarity.graphCurrentVersion(spark, root) === Some(1))

      // batch 2 serves v1:0
      input.addData(queryVecs: _*); q.processAllAvailable()
    } finally q.stop()

    def pin(b: Long): String =
      GraphServeStream.pinnedRecord(spark, outDir, b,
        fail(s"replay of batch $b must not re-resolve"))
    assert(pin(0L) === "0:0")
    assert(pin(1L) === "0:1")
    assert(pin(2L) === "1:0")

    def direct(v: Int, e: Long) = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.ivfTopKAtRest(spark, s"$p/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, p), nProbe = 3, k = 10,
          maxEpoch = e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    val byVersion = spark.read.parquet(outDir).collect()
      .groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
      }
    assert(byVersion.keySet === Set(0, 1))
    assert(byVersion(0) === (direct(0, 0L) ++ direct(0, 1L)))
    assert(byVersion(1) === direct(1, 0L))
    // the append genuinely changed v0's answers mid-version
    assert(direct(0, 0L) !== direct(0, 1L))
  }

  test("IVFPQ tier: the same loop with stored-book appends and retrained rotation") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-floopq-root").toString
    val outDir = Files.createTempDirectory("graft-floopq-out").toString
    val builtCells = Similarity.autoCells(base)
    def publish(c: DataFrame, cells: Int): Int =
      Similarity.ivfPqPublishVersion(c,
        Similarity.lloydCentroidDf(c, cells, 1),
        Similarity.pqTrainBooks(c, emb.filter(col("vec_id") < 16), 16, 1),
        root)
    assert(publish(base, builtCells) === 0)

    val input = MemoryStream[Vec]
    val q = IvfPqServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-floopq-ckpt").toString,
      nProbe = 3, k = 10)
    try {
      input.addData(queryVecs: _*); q.processAllAvailable()
      val d1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      val s1 = signalAfter("floop_pq_s1", 400L, builtCells, deltaVecs(d1))
      assert(!s1.rebuild)
      // the append encodes under v0's STORED books (meta-driven) —
      // nothing retrains mid-version
      assert(maintain(grown450, root, s1, publish,
        d => { Similarity.ivfPqAppendDelta(d,
          Similarity.graphVersionPath(root, 0)); () }) === "appended")
      input.addData(queryVecs: _*); q.processAllAvailable()
      val d2 = emb.filter(col("vec_id") >= 450)
      val s2 = signalAfter("floop_pq_s2", 400L, builtCells,
        deltaVecs(d1) ++ deltaVecs(d2))
      assert(s2.rebuild)
      assert(maintain(emb, root, s2, publish, _ => fail(
        "a fired signal must rotate, not append")) === "republished")
      input.addData(queryVecs: _*); q.processAllAvailable()
    } finally q.stop()

    def pin(b: Long): String =
      GraphServeStream.pinnedRecord(spark, outDir, b,
        fail(s"replay of batch $b must not re-resolve"))
    assert(pin(0L) === "0:0")
    assert(pin(1L) === "0:1")
    assert(pin(2L) === "1:0")

    def direct(v: Int, e: Long) = {
      val p = Similarity.graphVersionPath(root, v)
      Similarity.ivfPqTopKAtRest(spark, s"$p/codes",
          emb.filter(col("vec_id") < 5),
          Similarity.ivfStoredCentroids(spark, p),
          Similarity.ivfPqStoredBooks(spark, p), nProbe = 3, k = 10,
          maxEpoch = e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    val byVersion = spark.read.parquet(outDir).collect()
      .groupBy(_.getAs[Int]("index_version"))
      .map { case (v, rows) =>
        v -> rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("approx_dot"), r.getAs[Int]("rn"))).toSet
      }
    assert(byVersion.keySet === Set(0, 1))
    assert(byVersion(0) === (direct(0, 0L) ++ direct(0, 1L)))
    assert(byVersion(1) === direct(1, 0L))
    assert(direct(0, 0L) !== direct(0, 1L))
  }
}
