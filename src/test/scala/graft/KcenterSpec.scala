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

  test("mmr: λ=1 reduces to pure relevance top-m") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val mmr = graft.operators.Similarity.mmrSelect(corpus, q, 5, 1.0)
      .collect().map(_.getLong(1)).toSet
    val top = graft.operators.Similarity.bruteForceTopK(emb, q, 5)
      .collect().map(_.getLong(1)).toSet
    assert(mmr === top, "with no diversity term MMR is exact top-m")
  }

  test("mmr: a redundant twin of the best hit is skipped at low λ") {
    import org.apache.spark.sql.Row
    val dim = 64
    def vec(main: Int, eps: Float): Seq[Float] = {
      val v = Array.fill(dim)(0.0f); v(main) = 1.0f; v(main + 1) = eps
      v.toSeq
    }
    val rows = Seq(
      (0L, vec(0, 0.0f)),   // query
      (1L, vec(0, 0.01f)),  // best hit
      (2L, vec(0, 0.02f)),  // near-twin of the best hit
      (3L, vec(8, 0.01f)))  // diverse, low-relevance
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .mmrSelect(rows.filter(col("vec_id") =!= 0),
        rows.filter(col("vec_id") === 0), 2, 0.5)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 3L),
      "the twin (2) must lose to the diverse pick (3) at λ=0.5")
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
