package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Greedy k-center (Gonzalez farthest-point traversal): one pick per
  * planted cluster before densifying, the non-increasing coverage
  * radius property, and output shape.
  */
class KcenterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("coverage radius (the pick distance) never increases") {
    val rows = Similarity.kcenterSelect(emb, 8)
      .orderBy(col("sel_round")).collect()
    assert(rows.length === 8)
    assert(rows.head.isNullAt(2), "seed row carries no distance")
    val dists = rows.tail.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => b <= a },
      s"farthest-point distances must be non-increasing: ${dists.toSeq}")
    assert(rows.map(_.getLong(1)).distinct.length === 8, "distinct picks")
    assert(rows.head.getLong(1) ===
      emb.agg(min(col("vec_id"))).head.getLong(0), "seed = smallest vec_id")
  }

  test("planted clusters: the first m picks cover every cluster once") {
    val dim = 64
    val rows = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.fill(dim)(0.0f)
      v(axis * 3) = 1.0f
      v(axis * 3 + 1) = 0.01f * (i / 3 + 1)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val picks = Similarity.kcenterSelect(df, 3).collect()
      .map(_.getLong(1) % 3).toSet
    assert(picks === Set(0L, 1L, 2L),
      "3 picks over 3 orthogonal clusters must hit each cluster once")
  }

  test("at-rest k-center equals the scan-time operator on real data " +
    "(bounds loose, pruning idle — exactness anyway)") {
    val path = "target/atrest/kc-spec"
    val cent = emb.filter(col("vec_id") < 8)
    Similarity.ivfWriteAtRest(emb, cent, path)
    Similarity.ivfWriteCellStats(spark, path, cent)
    val direct = Similarity.kcenterSelect(emb, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val atRest = Similarity.kcenterSelectAtRest(spark, path, cent, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(atRest === direct)
  }

  test("at-rest k-center PRUNES cells on clustered geometry and stays exact") {
    val dim = 64
    // 4 tight orthogonal clusters; centroids = one exemplar each
    val rows = (0 until 64).map { i =>
      val axis = i % 4
      val v = Array.fill(dim)(0.0f)
      v(axis * 4) = 1.0f
      v(axis * 4 + 1) = 0.001f * (i / 4 + 1)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cent = df.filter(col("vec_id") < 4)
    val path = "target/atrest/kc-spec-clustered"
    Similarity.ivfWriteAtRest(df, cent, path)
    Similarity.ivfWriteCellStats(spark, path, cent)
    val probes = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val atRest = Similarity.kcenterSelectAtRest(spark, path, cent, 6,
        (round, probed, all) => probes += ((round, probed, all)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = Similarity.kcenterSelect(df, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(atRest === direct, "pruning must never change the answer")
    assert(probes.exists { case (_, probed, all) => probed < all },
      s"tight clusters must let at least one round prune: $probes")
  }
}
