package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
  * the λ=1 pure-relevance degeneration, the diversity-over-redundancy
  * behavior at low λ, and the one-query-row input contract.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("λ=1 reduces to pure relevance top-m") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val mmr = Similarity.mmrSelect(corpus, q, 5, 1.0)
      .collect().map(_.getLong(1)).toSet
    val top = Similarity.bruteForceTopK(emb, q, 5)
      .collect().map(_.getLong(1)).toSet
    assert(mmr === top, "with no diversity term MMR is exact top-m")
  }

  test("a redundant twin of the best hit is skipped at low λ") {
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
    val got = Similarity
      .mmrSelect(rows.filter(col("vec_id") =!= 0),
        rows.filter(col("vec_id") === 0), 2, 0.5)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 3L),
      "the twin (2) must lose to the diverse pick (3) at λ=0.5")
  }

  test("at-rest MMR equals the scan-time operator, and rejects λ outside [0,1]") {
    val path = "target/atrest/mmr-spec"
    val cent = emb.filter(col("vec_id") < 8)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0)
    Similarity.ivfWriteAtRest(corpus, cent, path)
    Similarity.ivfWriteCellStats(spark, path, cent)
    val direct = Similarity.mmrSelect(corpus, q, 6, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val atRest = Similarity.mmrSelectAtRest(spark, path, q, cent, 6, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(atRest === direct)
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelectAtRest(spark, path, q, cent, 2, 1.5)
    }
    assert(e.getMessage.contains("lambda"),
      s"bound validity contract must be named: ${e.getMessage}")
  }

  test("fail loud: a multi-row query DataFrame is rejected") {
    val corpus = emb.filter(col("vec_id") >= 2)
    val twoQueries = emb.filter(col("vec_id") < 2)
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(corpus, twoQueries, 3, 0.7)
    }
    assert(e.getMessage.contains("exactly one query row"),
      s"message must name the contract: ${e.getMessage}")
  }

  test("fail loud: an empty query DataFrame is rejected with context") {
    val corpus = emb.filter(col("vec_id") >= 1)
    val none = emb.filter(col("vec_id") < 0)
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(corpus, none, 3, 0.7)
    }
    assert(e.getMessage.contains("empty query"),
      s"message must name the empty input: ${e.getMessage}")
  }
}
