package graft

import java.nio.file.{Files, Paths}

import graft.sources.CorpusJsonl

/** JSONL corpus front door: valid lines parse to the documents schema,
  * malformed and field-incomplete lines land in quarantine verbatim,
  * nothing is silently dropped.
  */
class CorpusJsonlSpec extends SparkSpec {

  test("valid lines parse; corrupt and incomplete lines quarantine") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "zweites dokument", "lang": "de", "source": "web"}""",
      """{"doc_id": 3, "text": "minimal"}""",              // lang/source null: valid
      """{"doc_id": 4}""",                                  // no text: quarantined
      """not json at all""",                                // corrupt: quarantined
      """{"doc_id": "wrong-type", "text": 7}""",            // type mismatch: quarantined
      // schema-invalid but parseable, with EXTRA fields and formatting
      // that a re-serialization of the parsed subset would destroy
      """{"doc_id": 5,  "extra": [1, 2],   "note": "evidence"}"""
    )
    Files.write(Paths.get(dir.toString, "dump.jsonl"),
      lines.mkString("\n").getBytes)

    val parsed = CorpusJsonl.read(spark, dir.toString)
    val (good, quarantine) = CorpusJsonl.split(parsed)

    val docs = good.collect().map(r => r.getLong(0) ->
      ((r.getString(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(docs.keySet === Set(1L, 2L, 3L))
    assert(docs(1L) === (("hello world", Some("en"), Some("web"))))
    assert(docs(3L) === (("minimal", None, None)))

    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.length === 4, bad.mkString("|"))
    // every quarantined line is the ORIGINAL input byte-for-byte —
    // including parseable-but-schema-invalid ones (extra fields,
    // whitespace, field order all preserved)
    assert(bad.toSet === Set(lines(3), lines(4), lines(5), lines(6)),
      bad.mkString("|"))

    // accounting: every input line is exactly one of good/quarantine
    assert(good.count() + quarantine.count() === lines.length.toLong)
  }

  test("a clean round-trip feeds the curation operators unchanged") {
    val dir = Files.createTempDirectory("graft-jsonl2")
    import spark.implicits._
    val lines = (1 to 50).map(i =>
      s"""{"doc_id": $i, "text": "doc $i body words", "lang": "en", "source": "s${i % 3}"}""")
    Files.write(Paths.get(dir.toString, "d.jsonl"), lines.mkString("\n").getBytes)
    val (good, q) = CorpusJsonl.split(CorpusJsonl.read(spark, dir.toString))
    assert(q.count() === 0L)
    // flows straight into a gated operator
    val stats = graft.operators.TextAnalysis.textStats(good)
    assert(stats.count() === 50L)
    assert(stats.filter($"n_tokens" =!= 4L).count() === 0L)
  }
}
