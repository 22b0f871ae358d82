package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused IVF cell assignment: top-2 dot products of a vector against
  * LITERAL centroids under the (dot DESC, c_id ASC) rule every
  * IVF-family operator shares — the r18 codegen closure of the second
  * interpreted fold the r17 round left (`top2Cells` replaced the
  * per-row |cells|-struct sort with an `aggregate` fold, but that
  * fold still ran as a CodegenFallback: one |cells|-struct array plus
  * one 4-field accumulator row allocated per fold step, per corpus
  * row, at all nine cell-assignment sites).
  *
  * Bit-parity contract (unchanged from the fold it fuses): dots are
  * [[DotProductExpr]]'s left-to-right IEEE fold per centroid in BOOK
  * ORDER; the accumulator starts at (−Infinity, −1, −Infinity, −1)
  * and advances on a STRICT NaN-safe `>` (Spark's own double
  * ordering, what the interpreted fold's `>` compiled to), so
  * first-seen wins ties — the smallest c_id, exactly the
  * `array_sort((negcd, c_id))` head rule. Returns the same struct
  * (b1d, b1i, b2d, b2i); b2i = −1 when |cells| = 1.
  */
case class Top2CellsExpr(child: Expression, ids: Seq[Int], flat: Seq[Double])
    extends UnaryExpression {

  require(ids.nonEmpty, "empty centroid set")
  require(flat.length % ids.length == 0,
    s"flat centroid length ${flat.length} not divisible by ${ids.length} entries")

  private val k = ids.length
  private val dim = flat.length / ids.length

  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val centArr: Array[Double] = flat.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<double> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("b1d", DoubleType, nullable = false),
    StructField("b1i", IntegerType, nullable = false),
    StructField("b2d", DoubleType, nullable = false),
    StructField("b2i", IntegerType, nullable = false)))

  override def prettyName: String = "graft_top2cells"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var b1d = Double.NegativeInfinity
    var b1i = -1
    var b2d = Double.NegativeInfinity
    var b2i = -1
    var j = 0
    while (j < k) {
      val off = j * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * centArr(off + i)
        i += 1
      }
      val cmp1 = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(acc, b1d)
      if (cmp1 > 0) {
        b2d = b1d; b2i = b1i
        b1d = acc; b1i = idArr(j)
      } else if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(acc, b2d) > 0) {
        b2d = acc; b2i = idArr(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](b1d, b1i, b2d, b2i)): InternalRow
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cent = ctx.addReferenceObj("t2Cent", centArr, "double[]")
      val cIds = ctx.addReferenceObj("t2Ids", idArr, "int[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val b1d = ctx.freshName("b1d")
      val b1i = ctx.freshName("b1i")
      val b2d = ctx.freshName("b2d")
      val b2i = ctx.freshName("b2i")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double $b1d = Double.NEGATIVE_INFINITY;
         |int $b1i = -1;
         |double $b2d = Double.NEGATIVE_INFINITY;
         |int $b2i = -1;
         |for (int $j = 0; $j < $k; $j++) {
         |  int $off = $j * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * $cent[$off + $i];
         |  }
         |  if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($acc, $b1d) > 0) {
         |    $b2d = $b1d; $b2i = $b1i;
         |    $b1d = $acc; $b1i = $cIds[$j];
         |  } else if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($acc, $b2d) > 0) {
         |    $b2d = $acc; $b2i = $cIds[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$b1d, $b1i, $b2d, $b2i});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Top2CellsExpr =
    copy(child = newChild)
}
