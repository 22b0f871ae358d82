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

  test("a rebuild published mid-stream rotates answers atomically; old version stays readable") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-serve-vroot").toString
    assert(Similarity.graphCurrentVersion(spark, root).isEmpty)
    val v0 = Similarity.graphPublishVersion(emb, cent, 10, 2, root)
    assert(v0 === 0)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-serve-vout").toString
    val q = GraphServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-serve-vckpt").toString,
      beam = 6, rounds = 2, k = 10)
    val vecs = queryVecs(5)
    try {
      input.addData(vecs: _*); q.processAllAvailable()
      // rebuild with a different graph (0 descent rounds: seed edges
      // only) lands mid-stream — the next batch must serve from it
      val v1 = Similarity.graphPublishVersion(emb, cent, 10, 0, root)
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
      Similarity.graphTopKAtRest(spark, p, emb.filter(col("vec_id") < 5),
          Similarity.graphStoredCentroids(spark, p),
          beam = 6, rounds = 2, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    assert(sets(0) === direct(0),
      "pre-rebuild batch must be served whole from v0")
    assert(sets(1) === direct(1),
      "post-rebuild batch must rotate to v1 atomically")
    assert(sets(0) !== sets(1),
      "fixture degenerate: the rebuild did not change any answer")
  }

  test("a replayed batch re-reads its pinned index version instead of re-resolving") {
    val outDir = Files.createTempDirectory("graft-serve-pin").toString
    // original run resolves 0 and pins it
    assert(GraphServeStream.pinnedVersion(spark, outDir, 7L, 0) === 0)
    // a rebuild lands (resolver now says 1); the REPLAY of batch 7
    // must still serve from 0 — different answers under a different
    // index_version would break the "identical rows re-appended"
    // at-least-once contract
    assert(GraphServeStream.pinnedVersion(spark, outDir, 7L,
      fail("replay must not re-resolve")) === 0)
    // a NEW batch resolves fresh
    assert(GraphServeStream.pinnedVersion(spark, outDir, 8L, 1) === 1)
  }

  test("serving takes the bucket count from the layout's own meta (non-default buckets)") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-serve-bkt").toString
    // published with a NON-default bucket count: serving has no
    // buckets parameter to thread — it must come from the stored meta
    Similarity.graphPublishVersion(emb, cent, 10, 2, root, buckets = 16)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-serve-bkt-out").toString
    val q = GraphServeStream.startVersioned(spark, input.toDF(), root,
      outDir, Files.createTempDirectory("graft-serve-bkt-ckpt").toString,
      beam = 6, rounds = 2, k = 10)
    val vecs = queryVecs(5)
    try { input.addData(vecs: _*); q.processAllAvailable() } finally q.stop()
    val p = Similarity.graphVersionPath(root, 0)
    val direct = Similarity.graphTopKAtRest(spark, p,
        emb.filter(col("vec_id") < 5),
        Similarity.graphStoredCentroids(spark, p),
        beam = 6, rounds = 2, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val got = spark.read.parquet(outDir)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === direct)
    // an explicit WRONG bucket assertion still fails loud
    val ex = intercept[IllegalArgumentException] {
      Similarity.graphTopKAtRest(spark, p, emb.filter(col("vec_id") < 5),
        Similarity.graphStoredCentroids(spark, p),
        beam = 6, rounds = 2, k = 10, buckets = 64)
    }
    assert(ex.getMessage.contains("16 buckets"))
  }

  test("a legacy layout without meta fails with the format story, not a raw path error") {
    val p = Files.createTempDirectory("graft-serve-legacy").toString
    // fabricate a pre-meta layout: adj/nodes/heads only
    emb.limit(1).select(col("vec_id").as("src"), col("vec_id").as("dst"))
      .write.mode("overwrite").parquet(s"$p/adj")
    val ex = intercept[IllegalArgumentException] {
      Similarity.graphTopKAtRest(spark, p, emb.filter(col("vec_id") < 2),
        cent, beam = 4, rounds = 1, k = 5)
    }
    assert(ex.getMessage.contains("no meta relation"))
    assert(ex.getMessage.contains("rebuild"))
  }

  test("retention prunes old published versions but never the current one or an in-flight reader's") {
    val root = Files.createTempDirectory("graft-serve-retain").toString
    val v0 = Similarity.graphPublishVersion(emb, cent, 10, 0, root)
    val v1 = Similarity.graphPublishVersion(emb, cent, 10, 1, root)
    val v2 = Similarity.graphPublishVersion(emb, cent, 10, 2, root)
    assert(Seq(v0, v1, v2) === Seq(0, 1, 2))
    // a reader resolved v1 just before the prune (one micro-batch in
    // flight); keepLast=2 retains {v1, v2} and removes only v0
    val removed = Similarity.graphRetainVersions(spark, root, keepLast = 2)
    assert(removed === Seq(0))
    assert(Similarity.graphCurrentVersion(spark, root) === Some(2))
    val p1 = Similarity.graphVersionPath(root, 1)
    val midBatch = Similarity.graphTopKAtRest(spark, p1,
        emb.filter(col("vec_id") < 3),
        Similarity.graphStoredCentroids(spark, p1),
        beam = 6, rounds = 2, k = 10)
      .collect()
    assert(midBatch.nonEmpty, "the in-flight reader's version must survive")
    // keepLast=1 never touches the current version
    assert(Similarity.graphRetainVersions(spark, root, 1) === Seq(1))
    assert(Similarity.graphCurrentVersion(spark, root) === Some(2))
    assert(Similarity.graphRetainVersions(spark, root, 1) === Seq.empty)
    // an UNPUBLISHED directory (in-progress or failed rebuild) is not
    // a retention candidate
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v=3"))
    assert(Similarity.graphRetainVersions(spark, root, 1) === Seq.empty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v=3")),
      "an unpublished rebuild-in-progress dir must survive the prune")
  }

  test("big candidate id lists ride a broadcast semi-join; buckets still prune files") {
    // below IdInlineCap the id filter is a literal isin pushed into
    // the scan; above it (cap-sized serve batches: ~800k ids/round)
    // the same rows come from a broadcast LEFT SEMI join — no giant
    // expression tree — while the bucket isin keeps partition pruning
    val storedBk = spark.read.parquet(s"$indexPath/meta")
      .select(col("buckets")).head.getInt(0)
    val small = Similarity.graphAdjPruned(spark, indexPath, Seq(1L, 2L),
      storedBk)
    val ps = small.queryExecution.executedPlan.toString
    assert(ps.contains("PartitionFilters: [") && ps.contains("bucket"),
      ps.take(2000))
    assert(!ps.contains("Join"), "small id lists must stay literal")
    val bigIds = (0L until (Similarity.IdInlineCap + 5L)).toSeq
    val big = Similarity.graphAdjPruned(spark, indexPath, bigIds, storedBk)
    val pb = big.queryExecution.executedPlan.toString
    assert(pb.contains("LeftSemi"), pb.take(2000))
    assert(pb.contains("PartitionFilters: [") && pb.contains("bucket"),
      pb.take(2000))
    // both paths produce exactly the adjacency rows whose src is in
    // the id set (every bucket is probed here, so the row filter does
    // all the work)
    val idSet = bigIds.toSet
    val expected = spark.read.parquet(s"$indexPath/adj")
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => idSet(p._1)).toSet
    val got = big.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("a micro-batch beyond the 4096-query anchor bound is served chunked, not killed") {
    // 4150 queries in ONE trigger: the walk's require(<=4096) would
    // terminate the stream if foreachBatch handed the batch through
    // whole; chunked serving must instead produce exactly the answers
    // the same queries get when the triggers are small
    implicit val sqlCtx = spark.sqlContext
    val base = queryVecs(10)
    val big = (0 until 415).flatMap { i =>
      base.map(v => Vec(v.vec_id + 10000L * (i + 1), v.embedding))
    }
    def serve(batches: Seq[Seq[Vec]]): Set[(Long, Long, Double, Int)] = {
      val input = MemoryStream[Vec]
      val outDir = Files.createTempDirectory("graft-serve-big").toString
      val q = GraphServeStream.start(spark, input.toDF(), indexPath, cent,
        outDir, Files.createTempDirectory("graft-serve-big-ckpt").toString,
        beam = 4, rounds = 1, k = 5)
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    val chunked = serve(Seq(big))
    assert(chunked.map(_._1).size === big.length,
      "every query in the oversized batch must be answered")
    // replicas of the same vector under fresh ids walk identically —
    // the per-chunk answers are the batch-split-invariant answers
    val byVec = chunked.groupBy(t => t._1 % 10000L)
      .map { case (orig, rows) =>
        orig -> rows.groupBy(_._1).values
          .map(_.map(t => (t._2, t._3, t._4)).toSet).toSet
      }
    byVec.foreach { case (orig, answerSets) =>
      assert(answerSets.size === 1,
        s"replicated query $orig got ${answerSets.size} distinct answer sets")
    }
  }

  test("a batch with one vec_id duplicated past the cap degrades to rank chunking, not a livelock") {
    // hash membership sends every copy of a duplicated vec_id to the
    // same chunk under EVERY salt, so an at-least-once source
    // replaying one query >4096 times could never pass the size check
    // — the bounded-retry fallback must serve the batch via rank
    // chunking instead of doubling-and-recounting forever
    implicit val sqlCtx = spark.sqlContext
    val one = queryVecs(1).head
    val big = Seq.fill(5000)(one)
    val input = MemoryStream[Vec]
    val outDir = Files.createTempDirectory("graft-serve-dup").toString
    val q = GraphServeStream.start(spark, input.toDF(), indexPath, cent,
      outDir, Files.createTempDirectory("graft-serve-dup-ckpt").toString,
      beam = 4, rounds = 1, k = 5)
    try {
      input.addData(big: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // the duplicated query's answer set is the single-query answer;
    // each rank-chunk re-appended it (identical rows — the
    // at-least-once contract), so distinct rows collapse to one set
    val direct = Similarity.graphTopKAtRest(spark, indexPath,
        emb.filter(col("vec_id") < 1), cent, beam = 4, rounds = 1, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got.toSet === direct)
    assert(got.nonEmpty)
  }
}
