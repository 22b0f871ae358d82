package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins for the rows-only DEFLATE compression-ratio tier (no SQL
  * oracle exists for zlib): determinism, the discriminating ordering
  * the quality gate relies on, and exact small cases.
  */
class CompressRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.compressionRatio(df)
      .select(col("doc_id"), col("n_raw"), col("n_deflate"), col("ratio"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("template text compresses far better than prose; junk barely at all") {
    val template = Seq.fill(50)("click here to subscribe now").mkString(" ")
    val prose = "the migration of arctic terns spans both hemispheres " +
      "every single year crossing oceans deserts and mountain ranges " +
      "while navigating by sun stars and geomagnetic fields alone"
    // md5 hex chains are effectively incompressible
    val junk = (0 until 40).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"junk$i".getBytes).map("%02x".format(_)).mkString).mkString(" ")
    val r = ratios(Seq((1L, template), (2L, prose), (3L, junk))
      .toDF("doc_id", "text"))
    assert(r(1L)._4 < 0.15, s"template ratio ${r(1L)._4}")
    assert(r(2L)._4 > r(1L)._4, "prose must compress worse than template")
    // hex junk floors near its 4-bits/char entropy — well above the
    // template's long-range repetition, though SHORT prose can beat it
    // (deflate overhead dominates at 200 chars)
    assert(r(3L)._4 > 0.5, s"junk ratio ${r(3L)._4}")
    assert(r(3L)._4 > 3 * r(1L)._4, "junk must compress far worse than template")
  }

  test("deterministic across partitionings and repeated runs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = ratios(docs)
    val b = ratios(docs.repartition(13))
    assert(a === b)
    assert(a.size === docs.count())
    a.values.foreach { case (_, raw, defl, ratio) =>
      assert(defl > 0L)
      assert(math.abs(ratio - defl.toDouble / math.max(1L, raw)) < 1e-15)
    }
  }

  test("empty text yields the deflate empty-stream marker, ratio vs 1 byte") {
    val r = ratios(Seq((1L, "")).toDF("doc_id", "text"))
    val (_, raw, defl, ratio) = r(1L)
    assert(raw === 0L)
    assert(defl > 0L) // raw deflate emits a final empty stored block
    assert(ratio === defl.toDouble)
  }
}
