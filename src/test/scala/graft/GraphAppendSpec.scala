package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Similarity

/** Incremental insertion into the at-rest graph-ANN index
  * (insertion-by-search — the HNSW `add` recipe on the NN-Descent
  * layout): new nodes find their neighbors by the SAME greedy walk
  * serving runs, join the graph as forward adjacency plus reverse
  * edges at epoch N+1, and the meta count/fingerprint/epoch bumps
  * incrementally — so a grown corpus serves WITHOUT the full (even
  * warm) rebuild, closing the last asymmetry between the graph and
  * IVF serve tiers. Epoch pinning keeps replays deterministic and
  * hides crash ghosts, exactly the [[IndexAppendSpec]] contract.
  */
class GraphAppendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  private lazy val delta = emb.filter(col("vec_id") % 5 === 0)
  private lazy val cent = Similarity.lloydCentroidDf(base, 8, 1)

  private def build(path: String): Unit =
    Similarity.graphWriteAtRest(base, cent, 10, 3, path)

  private def walk(path: String, maxEpoch: Long = Similarity.EpochCommitted) =
    Similarity.graphTopKAtRest(spark, path, emb.filter(col("vec_id") < 5),
        Similarity.graphStoredCentroids(spark, path),
        beam = 20, rounds = 4, k = 10, entryProbe = 3, maxEpoch = maxEpoch)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("append inserts nodes, maintains the fingerprint incrementally, and the walk finds them") {
    val path = Files.createTempDirectory("graft-gap").toString
    build(path)
    val before = walk(path)
    val e = Similarity.graphAppendDelta(delta, path)
    assert(e === 1L)
    assert(Similarity.indexEpoch(spark, path) === 1L)
    // the window-XOR fingerprint was bumped without a base rescan:
    // fresh wrt the grown corpus, stale wrt the base
    assert(Similarity.indexFresh(spark, path, emb))
    assert(!Similarity.indexFresh(spark, path, base))
    val after = walk(path)
    assert(after !== before, "the grown graph must answer differently")
    val deltaIds = delta.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    assert(after.exists(t => deltaIds(t._2)),
      "inserted nodes must be findable through their reverse edges")
  }

  test("every inserted node is reachable: probing its own vector returns it at rank 1") {
    val path = Files.createTempDirectory("graft-gap-reach").toString
    build(path)
    Similarity.graphAppendDelta(delta, path)
    // probe a sample of inserted vectors under FRESH query ids (the
    // walk excludes self-hits by id, so a reused id would mask the
    // node): the nearest neighbor of a vector present in the corpus
    // is itself, cos 1 — rank 1 unless unreachable
    val probes = delta.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
    val expect = delta.filter(col("vec_id") < 50)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(expect.nonEmpty)
    val top1 = Similarity.graphTopKAtRest(spark, path, probes,
        Similarity.graphStoredCentroids(spark, path),
        beam = 20, rounds = 4, k = 10, entryProbe = 3)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getLong(1))).toMap
    expect.foreach { id =>
      assert(top1.get(id).contains(id),
        s"inserted node $id must be its own nearest neighbor")
    }
  }

  test("epoch pinning: a walk bounded at the build epoch reproduces pre-append answers") {
    val path = Files.createTempDirectory("graft-gap-epoch").toString
    build(path)
    val before = walk(path)
    Similarity.graphAppendDelta(delta, path)
    assert(walk(path, maxEpoch = 0L) === before,
      "epoch 0 must walk exactly the graph that existed at the build")
    assert(walk(path) !== before)
  }

  test("a crashed append leaves ghosts invisible to committed-epoch walks and further appends refused") {
    val path = Files.createTempDirectory("graft-gap-crash").toString
    build(path)
    val atBuild = walk(path)
    // simulate the crash window: delta nodes and edges landed at
    // epoch 1, meta never bumped
    delta.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", org.apache.spark.sql.functions
        .pmod(col("vec_id"), lit(64L)).cast("int"))
      .withColumn("epoch", lit(1L))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/nodes")
    assert(Similarity.indexEpoch(spark, path) === 0L)
    // the DEFAULT (committed-epoch) walk never sees the ghosts
    assert(walk(path) === atBuild)
    assert(!Similarity.indexFresh(spark, path, emb))
    val err = intercept[IllegalArgumentException] {
      Similarity.graphAppendDelta(delta, path)
    }
    assert(err.getMessage.contains("crashed append"))
  }

  test("ivfFreshen wraps the graph tier: pure growth appends, changed content rebuilds") {
    val path = Files.createTempDirectory("graft-gap-freshen").toString
    var rebuilds = 0
    // a contiguous frontier split (the append-only ingest shape
    // ivfFreshen's growth detection requires)
    val frontier = 399L
    val low = emb.filter(col("vec_id") <= frontier)
    val lowCent = Similarity.lloydCentroidDf(low, 8, 1)
    def freshen(c: org.apache.spark.sql.DataFrame): String =
      Similarity.ivfFreshen(c, path,
        rebuild = cc => { rebuilds += 1
          Similarity.graphWriteAtRest(cc, lowCent, 10, 3, path) },
        append = d => { Similarity.graphAppendDelta(d, path); () })
    assert(freshen(low) === "rebuilt" && rebuilds === 1)
    assert(freshen(low) === "fresh" && rebuilds === 1)
    assert(freshen(emb) === "appended" && rebuilds === 1)
    assert(Similarity.indexFresh(spark, path, emb))
    // regenerated content is NOT growth — full rebuild
    val regen = emb.withColumn("embedding",
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> x * CAST(1.5 AS FLOAT))"))
    assert(freshen(regen) === "rebuilt" && rebuilds === 2)
  }

  test("append preserves walk recall on the grown corpus (the fresh-build gate)") {
    import org.apache.spark.sql.functions._
    val appended = Files.createTempDirectory("graft-gap-recall").toString
    build(appended)
    Similarity.graphAppendDelta(delta, appended)
    // the comparison bar: a COLD full rebuild on the grown corpus
    // under the same entry tier — what the append saved us from paying
    val fresh = Files.createTempDirectory("graft-gap-recall-f").toString
    Similarity.graphWriteAtRest(emb, cent, 10, 3, fresh)
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("q_id"), col("vec_id"))
    def recallOf(path: String): Array[Double] = {
      val approx = Similarity.graphTopKAtRest(spark, path, q,
          Similarity.graphStoredCentroids(spark, path),
          beam = 20, rounds = 4, k = 10, entryProbe = 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      truth.join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg((count(col("hit")).cast("double") / count(lit(1)))
          .as("recall"))
        .collect().map(_.getDouble(1))
    }
    val ra = recallOf(appended)
    val rf = recallOf(fresh)
    val (avgA, avgF) = (ra.sum / ra.length, rf.sum / rf.length)
    assert(avgA >= avgF - 0.05,
      s"appended avg recall $avgA fell >0.05 below the fresh build's $avgF")
    assert(ra.min >= rf.min - 0.1,
      s"appended min recall ${ra.min} fell >0.1 below fresh ${rf.min}")
    assert(avgA >= 0.8, s"appended avg recall $avgA below the 0.8 floor")
  }
}
