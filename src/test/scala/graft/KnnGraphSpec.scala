package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** NN-Descent k-NN graph (Dong et al. WWW'11): keep-best
  * monotonicity, recall improvement over the seed graph, structural
  * caps, and in-cluster convergence on a planted geometry.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val cent = emb.filter(col("vec_id") < 8)

  test("autoCells: ceil(sqrt(n)) clamped to [8, 1024], same rule as the oracle SQL") {
    // 500 rows -> ceil(sqrt(500)) = 23; the clamps guard the driver
    // collect (<= 1024 literal centroids) and degenerate corpora
    assert(Similarity.autoCells(emb) === 23)
    assert(Similarity.autoCells(emb.limit(10)) === 8, "floor at 8")
    val wide = emb.crossJoin(spark.range(4000).select(col("id")))
      .select((col("vec_id") + col("id") * 1000L).as("vec_id"),
        col("embedding"))
    assert(Similarity.autoCells(wide) === 1024, "cap at 1024")
  }

  test("keep-best: every (node, rank) slot improves or holds per round") {
    val g0 = Similarity.knnGraph(emb, cent, 10, 0)
      .select(col("vec_id"), col("rn"), col("cos_sim").as("c0"))
    val g3 = Similarity.knnGraph(emb, cent, 10, 3)
      .select(col("vec_id"), col("rn"), col("cos_sim").as("c3"))
    val worse = g0.join(g3, Seq("vec_id", "rn"))
      .filter(col("c3") < col("c0")).count()
    assert(worse === 0L,
      "a descent round must never push a kept neighbor below the seed")
    // and strictly better somewhere: the local join found something
    val better = g0.join(g3, Seq("vec_id", "rn"))
      .filter(col("c3") > col("c0")).count()
    assert(better > 0L)
  }

  test("descent rounds improve recall@5 against the brute-force truth") {
    val truth = Similarity.bruteForceTopK(emb, emb, 5)
      .select(col("q_id").as("vec_id"), col("vec_id").as("nb_id"))
    def recall(rounds: Int): Double = {
      val g = Similarity.knnGraph(emb, cent, 10, rounds)
        .filter(col("rn") <= 5)
        .select(col("vec_id"), col("nb_id"), lit(1).as("hit"))
      truth.join(g, Seq("vec_id", "nb_id"), "left")
        .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
        .head.getDouble(0)
    }
    val r0 = recall(0)
    val r3 = recall(3)
    assert(r3 > r0 + 0.2,
      s"3 rounds must clearly beat the seed graph (seed $r0, got $r3)")
    assert(r3 > 0.6, s"recall@5 after 3 rounds should exceed 0.6, got $r3")
  }

  test("structure: at most k neighbors per node, no self edges, dense ranks") {
    val g = Similarity.knnGraph(emb, cent, 10, 2)
    assert(g.filter(col("vec_id") === col("nb_id")).count() === 0L)
    val perNode = g.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
    assert(perNode.filter(col("n") > 10).count() === 0L)
    assert(perNode.filter(col("n") =!= col("mx")).count() === 0L,
      "rn must be dense 1..n per node")
  }

  test("planted clusters: descent pulls every node's list into its cluster") {
    // three tight clusters around orthogonal axes, slight per-vector
    // jitter on a secondary dim so vectors are distinct
    val dim = 64
    val rows = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.fill(dim)(0.0f)
      v(axis * 3) = 1.0f
      v(axis * 3 + 1) = 0.01f * (i / 3 + 1)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(df, df.filter(col("vec_id") < 8), 5, 2)
    val cross = g.filter(col("rn") <= 3)
      .filter(col("vec_id") % 3 =!= col("nb_id") % 3).count()
    assert(cross === 0L,
      "top-3 neighbors of every node must come from its own cluster")
  }

  test("graph serving: deterministic walk, dense ranks, no self hits") {
    val path = "target/atrest/graph-servespec"
    Similarity.graphWriteAtRest(emb, cent, 10, 2, path)
    def run() = Similarity.graphTopKAtRest(spark, path,
        emb.filter(col("vec_id") < 5), cent, beam = 6, rounds = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4))
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq, "the fixed-round walk must be reproducible")
    assert(!a.exists(t => t._1 == t._2), "query must never hit itself")
    val perQ = a.groupBy(_._1)
    assert(perQ.size === 5)
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq,
        s"dense ranks per query $q")
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (x, y) => y <= x },
        s"ranked by cosine desc for query $q")
    }
  }

  test("graph serving: expansion rounds beat the entry points alone") {
    val path = "target/atrest/graph-servespec2"
    Similarity.graphWriteAtRest(emb, cent, 10, 2, path)
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("q_id"), col("vec_id"))
    def recall(rounds: Int): Double = {
      val g = Similarity.graphTopKAtRest(spark, path, q, cent,
          beam = 8, rounds = rounds, k = 10)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      truth.join(g, Seq("q_id", "vec_id"), "left")
        .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
        .head.getDouble(0)
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 > r0,
      s"two expansion rounds must beat seeds-only recall ($r0 -> $r2)")
    assert(r2 > 0.5, s"walk recall@10 should exceed 0.5, got $r2")
  }

  test("graph serving: a second entry cell never hurts and hedges the entry miss") {
    val path = "target/atrest/graph-servespec3"
    Similarity.graphWriteAtRest(emb, cent, 10, 2, path)
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("q_id"), col("vec_id"))
    def recall(probe: Int): Double = {
      val g = Similarity.graphTopKAtRest(spark, path, q, cent,
          beam = 8, rounds = 2, k = 10, entryProbe = probe)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      truth.join(g, Seq("q_id", "vec_id"), "left")
        .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)))
        .head.getDouble(0)
    }
    val p1 = recall(1)
    val p2 = recall(2)
    assert(p2 >= p1,
      s"a superset of entry points cannot lose candidates ($p1 -> $p2)")
  }
}
