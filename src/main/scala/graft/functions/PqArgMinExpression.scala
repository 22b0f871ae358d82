package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused PQ assignment: argmin-by-squared-L2 of a sub-vector against a
  * LITERAL codebook, returning the (d2, c_id) struct of the nearest
  * entry — the r18 closure of the PQ hot path (r17 verdict backlog:
  * the `graft_dist2` kernel was codegen'd but the `aggregate` fold
  * around it still ran interpreted as a CodegenFallback, allocating a
  * k-struct array plus one accumulator row per fold step per (row,
  * subspace): m·k struct churn per corpus vector at every PQ
  * write/train/encode site).
  *
  * Semantics are the assignment rule every PQ caller pins: per code in
  * BOOK ORDER (sorted by code id), d2 = the same left-to-right IEEE
  * fold as [[DistSqExpr]] (bit-identical to the oracle's list
  * comprehension); keep the strictly smaller d2, comparing with
  * Spark's own NaN-safe double ordering (what the interpreted fold's
  * `<` compiled to) — first-seen wins ties, which is the smallest
  * code id. The running best seeds from entry 0 (not the old
  * fold's (+Infinity, -1) accumulator), which preserves the original
  * `array_sort(...)[0]` head semantics for degenerate all-NaN /
  * all-infinite inputs instead of emitting c_id = -1 (r17 ADVICE);
  * for any finite d2 — every real embedding — the two seeds are
  * indistinguishable, and the PQ family stays oracle-bit-identical.
  *
  * The codebook rides as literal constructor data (k entries
  * flattened row-major into `flat`), same discipline as every
  * literal-centroid projection: the corpus is never shuffled to be
  * coded, and codegen reads the shared arrays via reference objects.
  */
case class PqArgMinExpr(child: Expression, ids: Seq[Int], flat: Seq[Double])
    extends UnaryExpression {

  require(ids.nonEmpty, "empty codebook")
  require(flat.length % ids.length == 0,
    s"flat codebook length ${flat.length} not divisible by ${ids.length} entries")

  private val k = ids.length
  private val sub = flat.length / ids.length

  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val bookArr: Array[Double] = flat.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<double> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("c_id", IntegerType, nullable = false)))

  override def prettyName: String = "graft_pq_argmin"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), sub)
    var bestD = 0.0
    var bestI = 0
    var j = 0
    while (j < k) {
      val off = j * sub
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - bookArr(off + i)
        acc += d * d
        i += 1
      }
      if (j == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(acc, bestD) < 0) {
        bestD = acc
        bestI = idArr(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestI)): InternalRow
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val book = ctx.addReferenceObj("pqBook", bookArr, "double[]")
      val bIds = ctx.addReferenceObj("pqIds", idArr, "int[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $sub);
         |double $bestD = 0.0;
         |int $bestI = 0;
         |for (int $j = 0; $j < $k; $j++) {
         |  int $off = $j * $sub;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $v.getDouble($i) - $book[$off + $i];
         |    $acc += $d * $d;
         |  }
         |  if ($j == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($acc, $bestD) < 0) {
         |    $bestD = $acc;
         |    $bestI = $bIds[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$bestD, $bestI});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqArgMinExpr =
    copy(child = newChild)
}
