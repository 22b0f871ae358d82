package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Benchmark decontamination: overlap counting, threshold, duplicate
  * shingles counted once, and the per-doc verdict rollup.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc 100: trigrams {a b c, b c d, c d e}
  private lazy val evalSet = Seq((100L, "a b c d e")).toDF("doc_id", "text")

  private lazy val train = Seq(
    (1L, "a b c d x"),          // shares {a b c, b c d} → 2
    (2L, "z z a b c q"),        // shares {a b c} → 1, below threshold
    (3L, "a b c d e f"),        // shares all 3 → contaminated
    (4L, "unrelated text entirely here"),
    (5L, "a b c a b c d")       // repeated shingle counts ONCE → 2
  ).toDF("doc_id", "text")

  test("overlaps counts distinct shared n-grams above the threshold") {
    val got = Decontaminate.overlaps(train, evalSet, 3, 2)
      .select("doc_id", "eval_id", "n_overlap")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 100L, 2L), (3L, 100L, 3L), (5L, 100L, 2L)))
  }

  test("contaminated rolls up the worst overlap per train doc") {
    val multiEval = evalSet.union(
      Seq((200L, "c d e f g")).toDF("doc_id", "text"))
    val got = Decontaminate.contaminated(train, multiEval, 3, 2)
      .select("doc_id", "n_eval_docs", "max_overlap")
      .as[(Long, Long, Long)].collect().toSet
    // doc 3 shares {c d e, d e f} with eval 200 as well
    assert(got === Set((1L, 1L, 2L), (3L, 2L, 3L), (5L, 1L, 2L)))
  }

  test("evalContamination reports per-eval seen-gram fraction") {
    val multiEval = evalSet.union(
      Seq((200L, "u v w x y")).toDF("doc_id", "text")) // no train collisions
    val got = Decontaminate.evalContamination(train, multiEval, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // eval 100: 3 trigrams; all 3 seen in train (a b c in docs 1,2,3,5;
    // b c d in 1,3,5; c d e in 3); colliding train docs = {1,2,3,5}
    assert(got(100L) === ((3L, 4L, 3L, 1.0)))
    // eval 200: untouched — zero hits, frac 0.0
    assert(got(200L) === ((3L, 0L, 0L, 0.0)))
  }

  test("eval side joins via broadcast, train side is never self-joined") {
    val plan = Decontaminate.overlaps(train, evalSet, 3, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("semanticDecontaminate flags embedding-space neighbors, zero shuffle") {
    // eval vector e1 = (1,0,0,...); corpus: an exact copy (cos 1.0),
    // a near copy (cos ~0.89), and an orthogonal vector (cos 0)
    val dim = 8
    def v(xs: Double*): Seq[Double] = xs ++ Seq.fill(dim - xs.length)(0.0)
    val evalSet = Seq((1000L, v(1.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(1.0)),        // exact duplicate of the eval item
      (2L, v(2.0, 1.0)),   // near: cos = 2/sqrt(5) ≈ 0.894
      (3L, v(0.0, 1.0)))   // orthogonal: cos = 0
      .toDF("vec_id", "embedding")
    val got = Decontaminate.semanticDecontaminate(corpus, evalSet, 0.8)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L))
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(math.abs(got(2L) - 2.0 / math.sqrt(5.0)) < 1e-12)
    // the whole operator is one scan + a map-side greatest fold
    val plan = Decontaminate.semanticDecontaminate(corpus, evalSet, 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("semanticDecontaminate with a multi-vector eval set takes the max") {
    val dim = 4
    def v(xs: Double*): Seq[Double] = xs ++ Seq.fill(dim - xs.length)(0.0)
    val evalSet = Seq((1000L, v(1.0)), (1001L, v(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    // aligned with the SECOND eval vector only
    val corpus = Seq((1L, v(0.0, 3.0))).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticDecontaminate(corpus, evalSet, 0.5)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L))
    assert(math.abs(got(1L) - 1.0) < 1e-12)
  }
}
