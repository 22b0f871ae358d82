package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Similarity
import graft.streaming.IvfPqServeStream
import graft.streaming.IvfStream.Vec

/** Incremental append to the standing ANN indexes (FAISS `add`
  * semantics): new vectors are assigned under the STORED coarse
  * quantizer, PQ-encoded under the STORED books, appended to the
  * existing cell partitions at the next epoch, and the meta
  * count+fingerprint is bumped incrementally — so a grown corpus
  * serves WITHOUT a rebuild and the grown standing index answers
  * bit-identically to a fresh build on the grown corpus (same
  * quantizer). Epoch pinning keeps checkpoint replays deterministic
  * under concurrent appends and hides the ghost rows of a crashed
  * append.
  */
class IndexAppendSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  private lazy val delta = emb.filter(col("vec_id") % 5 === 0)
  // the quantizer is trained ONCE on the base corpus and reused by
  // the fresh-on-grown reference build: append must match a rebuild
  // under the SAME stored cell set (a rebuild that retrains is the
  // drift monitor's separate decision)
  private lazy val cent = Similarity.lloydCentroidDf(base, 8, 1)

  private def probe(path: String, maxEpoch: Long = Long.MaxValue) =
    Similarity.ivfTopKAtRest(spark, s"$path/codes",
        emb.filter(col("vec_id") < 5),
        Similarity.ivfStoredCentroids(spark, path), nProbe = 2, k = 10,
        maxEpoch)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("IVF append == fresh rebuild on the grown corpus, bit-for-bit") {
    val appended = Files.createTempDirectory("graft-append-ivf").toString
    val fresh = Files.createTempDirectory("graft-fresh-ivf").toString
    Similarity.ivfWriteIndex(base, cent, appended)
    val e = Similarity.ivfAppendDelta(delta, appended)
    assert(e === 1L)
    assert(Similarity.indexEpoch(spark, appended) === 1L)
    Similarity.ivfWriteIndex(emb, cent, fresh)
    assert(probe(appended) === probe(fresh))
    assert(probe(appended).nonEmpty)
    // the fingerprint was maintained incrementally, never rescanned:
    // the grown index is fresh wrt the grown corpus, stale wrt base
    assert(Similarity.indexFresh(spark, appended, emb))
    assert(!Similarity.indexFresh(spark, appended, base))
  }

  test("epoch pinning: a probe bounded at the build epoch reproduces pre-append answers") {
    val path = Files.createTempDirectory("graft-append-epoch").toString
    Similarity.ivfWriteIndex(base, cent, path)
    val before = probe(path)
    Similarity.ivfAppendDelta(delta, path)
    assert(probe(path, maxEpoch = 0L) === before,
      "epoch 0 must see exactly the rows that existed at the build")
    assert(probe(path) !== before,
      "the unbounded probe must see the appended vectors")
  }

  private def booksOn(corpus: org.apache.spark.sql.DataFrame) =
    Similarity.pqTrainBooks(corpus, emb.filter(col("vec_id") < 16), 16, 1)

  private def pqProbe(path: String, enc: String = "raw",
                      maxEpoch: Long = Long.MaxValue) = {
    val books = Similarity.ivfPqStoredBooks(spark, path,
      expectEncoding = enc)
    val q = emb.filter(col("vec_id") < 5)
    val centS = Similarity.ivfStoredCentroids(spark, path)
    val df =
      if (enc == "residual")
        Similarity.ivfPqResidualTopKAtRest(spark, s"$path/codes", q,
          centS, books, nProbe = 2, k = 10, maxEpoch)
      else
        Similarity.ivfPqTopKAtRest(spark, s"$path/codes", q, centS,
          books, nProbe = 2, k = 10, maxEpoch)
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("IVFPQ append encodes under the STORED books and matches the fresh rebuild") {
    val appended = Files.createTempDirectory("graft-append-pq").toString
    val fresh = Files.createTempDirectory("graft-fresh-pq").toString
    val books = booksOn(base)
    Similarity.ivfPqWriteIndex(base, cent, books, appended)
    Similarity.ivfPqAppendDelta(delta, appended)
    Similarity.ivfPqWriteIndex(emb, cent, books, fresh)
    assert(pqProbe(appended) === pqProbe(fresh))
    assert(pqProbe(appended).nonEmpty)
    assert(Similarity.indexFresh(spark, appended, emb))
  }

  test("append to a residual layout routes through residual coding (meta-driven)") {
    val appended = Files.createTempDirectory("graft-append-res").toString
    val fresh = Files.createTempDirectory("graft-fresh-res").toString
    // residual coding requires dense 0..k-1 cell ids
    val denseCent = emb.filter(col("vec_id") < 8)
    // books trained on the full corpus (a contiguous seed window) —
    // the test exercises append ROUTING under stored books, not book
    // provenance; what matters is that append encodes the delta's
    // RESIDUALS under them, meta-driven
    val books = Similarity.pqTrainBooksResidual(emb, denseCent,
      seedK = 16, 16, 1)
    Similarity.ivfPqResidualWriteIndex(base, denseCent, books, appended)
    Similarity.ivfPqAppendDelta(delta, appended)
    Similarity.ivfPqResidualWriteIndex(emb, denseCent, books, fresh)
    assert(pqProbe(appended, enc = "residual") ===
      pqProbe(fresh, enc = "residual"))
    assert(pqProbe(appended, enc = "residual").nonEmpty)
  }

  test("a crashed append leaves ghosts invisible, the index stale, and further appends refused") {
    val path = Files.createTempDirectory("graft-append-crash").toString
    Similarity.ivfWriteIndex(base, cent, path)
    val atBuild = probe(path)
    // simulate the crash window: delta codes landed at epoch 1, meta
    // never bumped
    emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", lit(0))
      .withColumn("epoch", lit(1L))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    // (a) an epoch-pinned probe at meta's epoch never sees the ghosts
    assert(Similarity.indexEpoch(spark, path) === 0L)
    assert(probe(path, maxEpoch = 0L) === atBuild)
    // (a') the DEFAULT probe resolves the committed epoch from meta —
    //      ghosts are invisible without anyone passing an epoch; the
    //      unfiltered scan is the explicit Long.MaxValue opt-in
    assert(probe(path, maxEpoch = Similarity.EpochCommitted) === atBuild)
    // (b) the stamped fingerprint no longer matches the grown corpus
    //     (the meta bump never ran) — the convenience paths rebuild
    assert(!Similarity.indexFresh(spark, path, emb))
    // (c) stacking another append would reuse the ghosts' epoch and
    //     resurrect them as duplicates — refused
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfAppendDelta(delta, path)
    }
    assert(err.getMessage.contains("crashed append"))
  }

  test("ivfFreshen: fresh is a no-op, pure growth appends, changed content rebuilds") {
    val path = Files.createTempDirectory("graft-freshen").toString
    var rebuilds = 0
    def freshen(c: org.apache.spark.sql.DataFrame): String =
      Similarity.ivfFreshen(c, path,
        rebuild = cc => { rebuilds += 1; Similarity.ivfWriteIndex(cc, cent, path) },
        append = d => { Similarity.ivfAppendDelta(d, path); () })
    // base corpus: the low 4/5 by id (a contiguous frontier, the
    // append-only ingest shape)
    val frontier = emb.agg(org.apache.spark.sql.functions
      .expr("percentile(vec_id, 0.8)")).head.getDouble(0).toLong
    val baseLow = emb.filter(col("vec_id") <= frontier)
    assert(freshen(baseLow) === "rebuilt" && rebuilds === 1)
    assert(freshen(baseLow) === "fresh" && rebuilds === 1)
    // pure growth: rows strictly above the stored frontier — appended,
    // and the result equals a fresh build on the grown corpus under
    // the same quantizer
    assert(freshen(emb) === "appended" && rebuilds === 1)
    assert(Similarity.indexFresh(spark, path, emb))
    val viaFreshen = probe(path)
    val freshPath = Files.createTempDirectory("graft-freshen-ref").toString
    Similarity.ivfWriteIndex(emb, cent, freshPath)
    assert(viaFreshen === probe(freshPath))
    // regenerated content (same ids, different text of the window
    // rows) is NOT growth — full rebuild
    val regen = emb.withColumn("embedding",
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> x * CAST(1.5 AS FLOAT))"))
    assert(freshen(regen) === "rebuilt" && rebuilds === 2)
    // a shrink is not growth either
    assert(freshen(baseLow) === "rebuilt" && rebuilds === 3)
  }

  test("append to a pre-epoch layout is refused, not silently wrong") {
    val path = Files.createTempDirectory("graft-append-legacy").toString
    Similarity.ivfWriteIndex(base, cent, path)
    // strip the epoch column from meta — the pre-append format
    val legacy = spark.read.parquet(s"$path/meta").drop("epoch").collect()
    val schema = spark.read.parquet(s"$path/meta").drop("epoch").schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacy.toSeq, 1), schema)
      .write.mode("overwrite").parquet(s"$path/meta")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfAppendDelta(delta, path)
    }
    assert(err.getMessage.contains("predates append support"))
  }

  test("vectors appended mid-stream are findable by the next probe without a rebuild, and replay is epoch-pinned") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath = Files.createTempDirectory("graft-append-serve").toString
    val books = booksOn(base)
    Similarity.ivfPqWriteIndex(base, cent, books, indexPath)
    val outDir = Files.createTempDirectory("graft-append-serve-out").toString
    val ckpt = Files.createTempDirectory("graft-append-serve-ckpt").toString
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")))
      .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1))).toSeq
    val input = MemoryStream[Vec]
    val q = IvfPqServeStream.start(spark, input.toDF(), indexPath, outDir,
      ckpt, nProbe = 2, k = 10)
    try {
      input.addData(queries: _*); q.processAllAvailable()
      val afterB0 = spark.read.parquet(outDir).count()
      // the corpus grows mid-stream — no rebuild, no rotation
      Similarity.ivfPqAppendDelta(delta, indexPath)
      input.addData(queries: _*); q.processAllAvailable()
      val all = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(all.length > afterB0)
      // batch 2 (epoch 1) finds appended vectors; batch 1 (epoch 0)
      // cannot have — its pin predates them
      val deltaIds = delta.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      val b0 = pqProbe(indexPath, maxEpoch = 0L)
      val b1 = pqProbe(indexPath, maxEpoch = 1L)
      assert(b1.exists(t => deltaIds(t._2)),
        "the appended vectors must be findable by the next probe")
      assert(!b0.exists(t => deltaIds(t._2)))
      assert(all.toSet === (b0 ++ b1))
    } finally q.stop()
    // replay determinism: batch 0's pin survives the append — a
    // replayed batch 0 re-serves at epoch 0 (its original rows) even
    // though the live index now answers at epoch 1, and it never
    // re-resolves
    import graft.streaming.GraphServeStream
    assert(GraphServeStream.pinnedRecord(spark, outDir, 0L,
      fail("replay must not re-resolve")) === "0")
    assert(GraphServeStream.pinnedRecord(spark, outDir, 1L,
      fail("replay must not re-resolve")) === "1")
  }
}
