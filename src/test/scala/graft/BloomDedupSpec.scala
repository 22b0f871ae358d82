package graft

import graft.operators.Dedup

/** Incremental Bloom-prefiltered dedup: exact results (duplicates in,
  * novels out — including Bloom false positives killed by the confirm
  * join), case normalization, and the no-corpus-shuffle plan shape.
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with five dozen jugs")
  ).toDF("doc_id", "text")

  test("flags exact and case-insensitive duplicates, drops novel docs") {
    val newBatch = Seq(
      (10L, "the quick brown fox"),        // exact dupe
      (11L, "JUMPS OVER THE LAZY DOG"),    // dupe modulo lower()
      (12L, "an entirely novel document"), // novel
      (13L, "the quick brown foxes")       // near-miss, still novel
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainstCorpus(newBatch, corpus, 100L, 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(10L, 11L))
  }

  test("high fpp still yields exact results (confirm join kills FPs)") {
    // fpp = 0.5 makes Bloom false positives likely across 200 novels;
    // the confirm join must still reject every one
    val newBatch = (100 until 300).map(i => (i.toLong, s"novel doc number $i"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupAgainstCorpus(newBatch, corpus, 3L, 0.5)
    assert(got.count() === 0L)
  }

  test("corpus streams through a broadcast join, never a shuffle join") {
    val newBatch = Seq((10L, "the quick brown fox")).toDF("doc_id", "text")
    val plan = Dedup.dedupAgainstCorpus(newBatch, corpus, 100L, 0.01)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.toLowerCase.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("CorpusBloom sizes from the corpus; a fixed-capacity filter saturates") {
    import org.apache.spark.sql.functions.{col, lower, md5}
    val big = (1 to 5000).map(i => (i.toLong, s"corpus document body $i"))
      .toDF("doc_id", "text")
    val cb = new graft.streaming.CorpusBloom()
    val f1 = cb.filterFor(big)
    assert(cb.rebuilds === 1 && cb.trackedRows === 5000L)
    // second call within capacity: cached, not rebuilt
    assert(cb.filterFor(big) eq f1)
    assert(cb.rebuilds === 1)
    // sized from the actual corpus count → novel fps rarely collide
    val novelFps = (1 to 1000).map(i => md5hex(s"novel doc $i"))
    val sizedRate = novelFps.count(f1.mightContainString) / 1000.0
    assert(sizedRate <= 0.05, s"sized filter fp rate $sizedRate")
    // the failure mode being fixed: a filter whose fixed expectedItems
    // the corpus has outgrown passes nearly everything
    val saturated = big.select(md5(lower(col("text"))).as("fp"))
      .stat.bloomFilter("fp", 10L, 0.01)
    val satRate = novelFps.count(saturated.mightContainString) / 1000.0
    assert(satRate >= 0.5, s"expected saturation, got $satRate")
  }

  test("recordAppended keeps the filter a corpus superset; growth rebuilds") {
    val small = (1 to 10).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val cb = new graft.streaming.CorpusBloom(headroom = 1, minCapacity = 12)
    val f = cb.filterFor(small)
    assert(cb.rebuilds === 1 && cb.trackedRows === 10L)
    val appended = Seq(md5hex("appended one"), md5hex("appended two"))
    assert(!appended.exists(f.mightContainString))
    cb.recordAppended(appended)
    // the stream's own appends are visible with NO rebuild
    assert(appended.forall(f.mightContainString))
    assert(cb.trackedRows === 12L)
    cb.filterFor(small) // tracked (12) <= capacity (12): still cached
    assert(cb.rebuilds === 1)
    cb.recordAppended(Seq(md5hex("appended three")))
    cb.filterFor(small) // tracked (13) > capacity (12): resized rebuild
    assert(cb.rebuilds === 2)
  }

  test("recordAppendedFrom merges an executor-built filter bitwise") {
    import org.apache.spark.sql.functions.{col, lower, md5}
    val corpus = (1 to 50).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val cb = new graft.streaming.CorpusBloom(minCapacity = 256)
    val f = cb.filterFor(corpus)
    // an appended frame whose fp column is the filter key: the batch
    // filter is built with the live filter's (capacity, fpp), so the
    // bit arrays are structurally identical and the merge is bitwise
    val appended = Seq(
      (100L, "streamed alpha"), (101L, "streamed beta"))
      .toDF("doc_id", "text")
      .withColumn("fp", md5(lower(col("text"))))
    val keys = appended.select("fp").as[String].collect()
    assert(!keys.exists(f.mightContainString))
    cb.recordAppendedFrom(appended, col("fp"))
    assert(keys.forall(f.mightContainString))
    assert(cb.trackedRows === 52L)
    // before the first build it is a no-op, not a crash
    val cold = new graft.streaming.CorpusBloom()
    cold.recordAppendedFrom(appended, col("fp"))
    assert(cold.trackedRows === 0L)
  }

  test("recordAppendedFrom pins a non-deterministic frame to one pass") {
    import org.apache.spark.sql.functions.{col, concat, lit, rand}
    val corpus = (1 to 50).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val cb = new graft.streaming.CorpusBloom(minCapacity = 256)
    val f = cb.filterFor(corpus)
    // a frame whose key column is non-deterministic: without an eager
    // pin inside the method, the count action and the bloom action
    // would evaluate rand() twice and disagree on the keys covered
    val nd = spark.range(20)
      .withColumn("fp", concat(lit("nd-"), (rand(7) * 1e9).cast("long")))
    cb.recordAppendedFrom(nd, col("fp"))
    assert(cb.trackedRows === 70L)
    // the merged bits must cover EXACTLY the keys the count saw: every
    // fp the pinned frame produced is now a member
    // (re-evaluating nd would give different values; so instead assert
    // via behavior: a second record of the SAME plan adds 20 more
    // tracked rows and still never throws)
    cb.recordAppendedFrom(nd, col("fp"))
    assert(cb.trackedRows === 90L)
    assert(f != null)
  }
}
