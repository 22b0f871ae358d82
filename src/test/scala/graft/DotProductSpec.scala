package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotProductExpr, VectorFunctions}

/** The native codegen dot product must be bit-identical to the
  * declarative zip_with/aggregate fold (same summation order), and
  * reachable from SQL as graft_dot.
  */
class DotProductSpec extends SparkSpec {

  private lazy val emb =
    graft.core.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))

  test("codegen dot == declarative dot, bit for bit") {
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") % 17 === col("b.vec_id") % 17 &&
        col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorFunctions.dot(col("a.v"), col("b.v")).as("fast"),
        VectorFunctions.dotDeclarative(col("a.v"), col("b.v")).as("slow"))
    val mismatches = pairs.filter(
      // bit-exact: compare raw IEEE-754 bits, not within-epsilon
      expr("cast(fast as string) != cast(slow as string)")).count()
    assert(mismatches === 0L)
    assert(pairs.count() > 1000)
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    // a codegen'd operator prints with a *(stage) prefix; the
    // interpreted transform() projection below it prints without one
    val plan = emb.select(VectorFunctions.dot(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"), plan.take(1000))
  }

  test("graft_dot is callable from SQL after registration") {
    DotProductExpr.register(spark)
    emb.createOrReplaceTempView("emb_dot_test")
    val r = spark.sql(
      "SELECT graft_dot(v, v) AS d FROM emb_dot_test WHERE vec_id = 0")
      .head().getDouble(0)
    assert(r > 0.0)
  }

  test("wrong arity raises a proper analysis error, not an index crash") {
    DotProductExpr.register(spark)
    emb.createOrReplaceTempView("emb_dot_test")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(v) FROM emb_dot_test").collect()
    }
    assert(e.getMessage.contains("graft_dot"), e.getMessage)
    assert(e.getCondition != null &&
      e.getCondition.startsWith("WRONG_NUM_ARGS"), e.getCondition)
  }
}
