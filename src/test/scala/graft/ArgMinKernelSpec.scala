package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.{PqArgMinExpr, Top2CellsExpr, VectorFunctions}
import graft.operators.Similarity

/** The r18 fused assignment kernels must be bit-identical to the
  * interpreted folds they replace (the same contract DotProductSpec
  * pins for graft_dot): PqArgMinExpr vs the strict-< dist2 fold,
  * Top2CellsExpr vs the strict-> dot fold, plus the degenerate-input
  * seed fix the r17 ADVICE asked for and the no-fallback codegen
  * check.
  */
class ArgMinKernelSpec extends SparkSpec {

  private lazy val emb =
    graft.core.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))

  private lazy val books = Similarity.pqInitBooks(
    emb.filter(col("vec_id") < 16).select(col("vec_id"), col("v").as("embedding")),
    m = 4)

  private def pqArgMin(sv: org.apache.spark.sql.Column,
      book: Seq[(Int, Array[Double])]): org.apache.spark.sql.Column =
    ColumnBridge.column(PqArgMinExpr(ColumnBridge.expression(sv),
      book.map(_._1), book.flatMap(_._2.toSeq)))

  test("PqArgMinExpr == declarative strict-< fold, bit for bit") {
    val sub = books.head.head._2.length
    val withSv = emb.select(col("vec_id") +: col("v") +:
      books.indices.map(j =>
        slice(col("v"), j * sub + 1, sub).as(s"sv_$j")): _*)
    books.indices.foreach { j =>
      val both = withSv.select(
        pqArgMin(col(s"sv_$j"), books(j)).as("fast"),
        Similarity.assignStructDeclarative(col(s"sv_$j"), books(j)).as("slow"))
      val mismatches = both.filter(
        expr("cast(fast.d2 as string) != cast(slow.d2 as string)") ||
          expr("fast.c_id != slow.c_id")).count()
      assert(mismatches === 0L, s"subspace $j")
    }
    assert(emb.count() > 100)
  }

  test("Top2CellsExpr == declarative strict-> fold, bit for bit") {
    val cent = emb.filter(col("vec_id") < 13).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    val both = emb.select(
      ColumnBridge.column(Top2CellsExpr(ColumnBridge.expression(col("v")),
        cent.map(_._1), cent.flatMap(_._2.toSeq))).as("fast"),
      Similarity.top2CellsDeclarative(cent).as("slow"))
    val mismatches = both.filter(
      expr("cast(fast.b1d as string) != cast(slow.b1d as string)") ||
        expr("fast.b1i != slow.b1i") ||
        expr("cast(fast.b2d as string) != cast(slow.b2d as string)") ||
        expr("fast.b2i != slow.b2i")).count()
    assert(mismatches === 0L)
  }

  test("all-NaN sub-vector keeps the first book entry (ADVICE seed fix)") {
    // the old (+Infinity, -1) fold seed returned c_id = -1 here, which
    // downstream turned into cell=-1 partitions; the sorted-head rule
    // (and this kernel) keeps the first entry
    import spark.implicits._
    val sub = books.head.head._2.length
    val nan = Seq(Tuple1(Array.fill(sub)(Double.NaN)))
      .toDF("sv").select(VectorFunctions.asDouble(col("sv")).as("sv"))
    val r = nan.select(pqArgMin(col("sv"), books.head).as("a"))
      .select(col("a.c_id")).head.getInt(0)
    assert(r === books.head.head._1)
  }

  test("whole-stage codegen keeps both kernels inline (no fallback)") {
    // sv_0 / v are referenced TWICE so CollapseProject leaves the
    // interpreted transform() in its own projection below (the
    // DotProductSpec dot(v,v) trick) — the kernel's Project must then
    // carry the *(n) whole-stage prefix
    val sub = books.head.head._2.length
    val plan = emb
      .select(col("v"), slice(col("v"), 1, sub).as("sv_0"))
      .select(pqArgMin(col("sv_0"), books.head).as("a"), col("sv_0"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_pq_argmin.*"),
      plan.take(1000))
    val cent = books.head.map { case (id, cv) => (id, cv) }
    val plan2 = emb
      .select(ColumnBridge.column(Top2CellsExpr(
        ColumnBridge.expression(col("v")),
        cent.map(_._1), cent.flatMap(_._2.toSeq))).as("t"), col("v"))
      .queryExecution.executedPlan.toString
    assert(plan2.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_top2cells.*"),
      plan2.take(1000))
  }
}
