package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency: every name the bench/scale harnesses time
  * must exist in the declared query map, and every oracle belongs to
  * a declared query — a typo here silently drops a measurement or a
  * correctness row, so it fails loud instead.
  */
class RegistrySpec extends AnyFunSuite {

  private val declared = Queries.queries.keySet

  test("headline bench names are all declared queries") {
    val missing = Queries.headline.filterNot(declared)
    assert(missing.isEmpty, s"headline names not in registry: $missing")
    assert(Queries.headline.distinct.size === Queries.headline.size,
      "duplicate headline entries")
  }

  test("scale-curve names are declared; sf10 set is a subset") {
    val missing = ScaleBench.ScaleQueries.filterNot(declared)
    assert(missing.isEmpty, s"scale names not in registry: $missing")
    val notInScale = ScaleBench.Sf10Queries -- ScaleBench.ScaleQueries.toSet
    assert(notInScale.isEmpty,
      s"sf10 queries missing from ScaleQueries: $notInScale")
  }

  test("every oracle key is a declared query") {
    val orphans = Queries.oracles.keySet -- declared
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only tier is exactly the documented set") {
    val rowsOnly = declared -- Queries.oracles.keySet
    assert(rowsOnly === Set("o11_daily_unique_approx",
      "pipeline_quality_cutoff_approx", "pipeline_bpe_train256",
      "text_compress_ratio"),
      s"undocumented rows-only queries: $rowsOnly")
  }
}
