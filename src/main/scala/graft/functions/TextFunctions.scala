package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/hash primitives shared by the text-analysis and
  * dedup operators. Everything here is built-in Catalyst expression
  * surface (whole-stage-codegen friendly — no UDFs), and every hash is
  * derived from `md5`, which is bit-identical across engines so the
  * DuckDB oracle can check the fancy operators exactly.
  */
object TextFunctions {

  /** Whitespace tokens (single-space delimited corpus). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** 60-bit non-negative integer hash of a string: the first 15 hex chars
    * of md5, base-16 → base-10. Engine-portable (md5 + string slicing
    * only) and safely inside the positive Long range.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL-expression form of [[hash60]] for use inside lambda strings. */
  def hash60Sql(inner: String): String =
    s"cast(conv(substring(md5($inner), 1, 15), 16, 10) as bigint)"

  /** Count of non-overlapping occurrences of `marker` in `padded`,
    * via the length-difference trick — pure string arithmetic, identical
    * in any engine.
    */
  def occurrences(padded: Column, marker: String): Column =
    ((length(padded) - length(replace(padded, lit(marker), lit(""))))
      / lit(marker.length)).cast("long")

  /** Text padded with single spaces so word-boundary markers match at the
    * ends too.
    */
  def padded(text: Column): Column = concat(lit(" "), text, lit(" "))
}
