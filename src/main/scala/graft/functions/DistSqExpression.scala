package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance of two dense
  * double vectors — the PQ-assignment kernel (r17, guide §1.2
  * per-task work).
  *
  * The declarative form the PQ tier used —
  * `dot(zip_with(a, b, (x, y) => x - y), <same zip_with again>)` —
  * allocates a difference array per evaluation AND evaluates the
  * zip_with twice (the two `dot` children are separate subtrees; the
  * assignment fold runs under a CodegenFallback higher-order function,
  * where no common-subexpression elimination applies). At m=16
  * subspaces × k=16 codes that was 512 array allocations per corpus
  * row. This expression is one allocation-free primitive loop
  * computing Σ (a_i − b_i)·(a_i − b_i) left-to-right — bit-identical
  * to the declarative form (the difference is a deterministic IEEE
  * value; squaring it equals multiplying the twice-computed copies)
  * and to the DuckDB oracle's list-comprehension fold.
  *
  * Same caveats as [[DotProductExpr]]: dense arrays only, unequal
  * lengths truncate to the common prefix (fixed-dimension embedding
  * slices in every caller).
  */
case class DistSqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DistSqExpr =
    copy(left = newLeft, right = newRight)
}
