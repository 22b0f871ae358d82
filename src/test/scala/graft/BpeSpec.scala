package graft

import graft.operators.Bpe

/** BPE trainer semantics on hand-computed corpora: merge order,
  * tie-breaking, early vocabulary exhaustion, the self-overlapping-run
  * rewrite, and encode-side compression.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order, lexicographic tie-break, and early exhaustion") {
    // words: aa x3, ab x3 -> round 1 ties ("a a" vs "a b", both 3);
    // "a a" wins lexicographically; round 2 merges "a b"; round 3 has
    // no pairs left so asking for 3 rounds yields exactly 2 merges
    val docs = Seq(1L -> "aa ab aa", 2L -> "ab aa ab").toDF("doc_id", "text")
    val merges = Bpe.bpeMerges(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq((1, "a a", "aa", 3L), (2, "a b", "ab", 3L)))
  }

  test("self-overlapping run rewrites deterministically") {
    // "aaaaa" -> "a a a a a"; pair "a a" occurs 4 times (overlapping
    // starts); the double-pass boundary replace yields "aa a aa"
    val docs = Seq(1L -> "aaaaa").toDF("doc_id", "text")
    val merges = Bpe.bpeMerges(docs, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq((1, "a a", "aa", 4L), (2, "a aa", "aaa", 1L)))
    val seg1 = Bpe.bpeSegment(docs, 1).head()
    assert(seg1.getLong(1) === 1L && seg1.getLong(2) === 3L) // "aa a aa"
  }

  test("encode compresses monotonically with more merges") {
    val docs = Seq(
      1L -> "lower lowest low low newer newest new",
      2L -> "low lower new newer wider widest wide").toDF("doc_id", "text")
    val counts = (1 to 6).map { r =>
      Bpe.bpeSegment(docs, r).agg(org.apache.spark.sql.functions.sum("n_bpe"))
        .head().getLong(0)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts)
    // and it never compresses past one token per word
    val words = docs.as[(Long, String)].collect()
      .map(_._2.split(" ").length.toLong).sum
    assert(counts.last >= words)
  }
}
