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
}
