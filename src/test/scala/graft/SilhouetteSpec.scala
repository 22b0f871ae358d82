package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Round-9 vector/distribution metrics: linear-cost silhouette vs a
  * brute-force quadratic reference, JL projection statistics, and the
  * per-source KL drift audit.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("linear silhouette equals the quadratic definition") {
    val cents = emb.filter(col("vec_id") < 4)
    val got = Similarity.silhouette(emb, cents)
      .select(col("vec_id"), col("cell"), col("s"))
      .as[(Long, Int, Double)].collect()
      .map { case (id, c, s) => id -> (c, s) }.toMap

    // brute force: cosine distances over collected vectors
    val rows = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val cent = rows.filter(_._1 < 4)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def nrm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
    val cells = rows.map { case (id, v) =>
      val best = cent.map { case (cid, cv) => (-dot(v, cv), cid) }.min
      id -> best._2.toInt
    }.toMap
    def cosDist(a: Seq[Double], b: Seq[Double]): Double =
      1.0 - dot(a, b) / (nrm(a) * nrm(b))
    rows.foreach { case (id, v) =>
      val own = rows.filter { case (j, _) => cells(j) == cells(id) && j != id }
      val a = if (own.isEmpty) Double.NaN
        else own.map(o => cosDist(v, o._2)).sum / own.length
      val others = rows.groupBy { case (j, _) => cells(j) }
        .filter(_._1 != cells(id))
        .map { case (_, vs) => vs.map(o => cosDist(v, o._2)).sum / vs.length }
      val b = if (others.isEmpty) Double.NaN else others.min
      val expected =
        if (a.isNaN || b.isNaN || math.max(a, b) <= 0.0) 0.0
        else (b - a) / math.max(a, b)
      val (gotCell, gotS) = got(id)
      assert(gotCell === cells(id), s"cell mismatch for $id")
      assert(math.abs(gotS - expected) < 1e-9,
        s"silhouette mismatch for $id: $gotS vs $expected")
    }
  }

  test("JL projection preserves norms and anchor distances on average") {
    val r = Similarity.randomProjection(emb, 64, 16)
      .select(col("n2_orig"), col("n2_proj"),
        col("d2_anchor_orig"), col("d2_anchor_proj"))
      .as[(Double, Double, Double, Double)].collect()
    val normRatios = r.filter(_._1 > 0).map(x => x._2 / x._1)
    val meanNorm = normRatios.sum / normRatios.length
    assert(math.abs(meanNorm - 1.0) < 0.25,
      s"mean norm ratio $meanNorm drifted from 1")
    val dr = r.filter(_._3 > 1e-9).map(x => x._4 / x._3)
    val meanDist = dr.sum / dr.length
    assert(math.abs(meanDist - 1.0) < 0.25,
      s"mean distance ratio $meanDist drifted from 1")
  }

  test("source KL is zero for identically distributed sources") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s2"),
      (3L, "d e", "s1"), (4L, "d e", "s2")
    ).toDF("doc_id", "text", "source")
    val kl = Curation.sourceKl(docs)
      .select(col("source"), col("kl")).as[(String, Double)].collect().toMap
    assert(kl.keySet === Set("s1", "s2"))
    kl.values.foreach(v => assert(math.abs(v) < 1e-12, s"kl $v"))
  }

  test("JS drift: zero for identical sources, ln 2 for disjoint ones") {
    val same = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2")
    ).toDF("doc_id", "text", "source")
    Curation.sourceJsDrift(same)
      .select(col("jsd")).as[Double].collect()
      .foreach(v => assert(math.abs(v) < 1e-12, s"jsd $v"))
    val disjoint = Seq(
      (1L, "a a b", "s1"), (2L, "c d d", "s2")
    ).toDF("doc_id", "text", "source")
    Curation.sourceJsDrift(disjoint)
      .select(col("jsd")).as[Double].collect()
      .foreach(v => assert(math.abs(v - math.log(2.0)) < 1e-12, s"jsd $v"))
  }

  test("source KL matches a hand-computed drift") {
    // s1: a a b (P = 2/3, 1/3); corpus: a a b a b b (P = 1/2, 1/2)
    val docs = Seq(
      (1L, "a a b", "s1"), (2L, "a b b", "s2")
    ).toDF("doc_id", "text", "source")
    val kl = Curation.sourceKl(docs)
      .select(col("source"), col("n_tokens"), col("kl"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val expected = 2.0 / 3 * math.log((2.0 / 3) / 0.5) +
      1.0 / 3 * math.log((1.0 / 3) / 0.5)
    assert(kl("s1")._1 === 3L)
    assert(math.abs(kl("s1")._2 - expected) < 1e-12)
    assert(math.abs(kl("s2")._2 - expected) < 1e-12) // symmetric fixture
  }
}
