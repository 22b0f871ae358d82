package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` columns, built from
  * Catalyst's higher-order array functions (`zip_with` / `aggregate`) —
  * codegen'd, no UDFs, no shuffle.
  *
  * Elements are cast to double BEFORE any arithmetic and summed
  * left-to-right by `aggregate`'s sequential fold, so results are
  * bit-identical across engines that do the same (the DuckDB oracle
  * mirrors this with list comprehensions + list_sum).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold sum of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Declarative dot product (interpreted; kept as the reference
    * semantics the codegen expression must match).
    */
  def dotDeclarative(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** Dot product via the native codegen'd [[DotProductExpr]] — same
    * left-to-right summation, ~10x faster in pairwise scoring.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Squared L2 distance via the native codegen'd [[DistSqExpr]] —
    * bit-identical to `dot(zip_with(a,b,-), zip_with(a,b,-))` without
    * the per-evaluation difference-array allocations.
    */
  def distSq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      DistSqExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
