package graft

import graft.operators.Multimodal

/** Multimodal plumbing: typed mapPartitions decode (stub codec),
  * metadata-driven frame sampling, size-balanced repartitioning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.core.Tables.read(spark, "/root/testdata/sf0.001", "documents")
  private lazy val media = Multimodal.fromDocuments(docs)

  test("stub decode is deterministic and md5-derived") {
    val feats = Multimodal.decodeFeatures(media)
    val row = feats.filter(_.media_id == 0L).head()
    val text = docs.filter($"doc_id" === 0).select("text").as[String].head()
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    assert(row.n_bytes === text.getBytes("UTF-8").length.toLong)
    assert(row.f0 === (h(0) & 0xff) / 255.0)
    assert(row.f3 === (h(3) & 0xff) / 255.0)
    // features are in [0, 1] for every row
    assert(feats.filter(f => f.f0 < 0 || f.f0 > 1).isEmpty)
  }

  test("frame sampling steps through n_frames by the given stride") {
    val frames = Multimodal.frameSample(media, 10)
    val one = media.filter(_.media_id == 1L).head()
    val got = frames.filter($"media_id" === 1)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(got === (0 until one.n_frames by 10).toSeq)
  }

  test("size-balanced repartition preserves rows") {
    val balanced = Multimodal.sizeBalanced(media, 4)
    assert(balanced.count() === media.count())
    assert(balanced.rdd.getNumPartitions === 4)
  }

  test("resize stub truncates payloads by the factor, shuffle-free") {
    val resized = Multimodal.resizeStub(media, 4)
    val rows = resized.collect()
    assert(rows.length === media.count())
    rows.foreach { r =>
      assert(r.dst_bytes === (r.src_bytes + 3) / 4)
      assert(r.content.length.toLong === r.dst_bytes)
    }
    // prefix property: the resized payload is a prefix of the source
    val src = media.filter(_.media_id == 1L).head().content
    val dst = resized.filter(_.media_id == 1L).head().content
    assert(src.take(dst.length).sameElements(dst))
    // narrow map: no exchange in the plan
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}
