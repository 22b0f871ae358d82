package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Prefix-filtered set-similarity join (PPJoin), blocked edit-distance
  * pairs, and the round-9 text metrics (PMI, readability, Zipf).
  */
class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b, math.rint(j * 1e9) / 1e9) }.toSet

  test("ppjoin equals the all-pairs Jaccard reference exactly") {
    for (t <- Seq(0.5, 0.6, 0.8)) {
      val exact = pairSet(Dedup.ngramJaccard(docs, 3, t))
      val pp = pairSet(Dedup.ppjoin(docs, 3, t))
      assert(pp === exact, s"threshold $t: prefix filtering must be lossless")
      assert(exact.nonEmpty || t > 0.7,
        s"fixture degenerate: no pairs at threshold $t")
    }
  }

  test("block-combination simhash equals the brute-force Hamming truth") {
    // pigeonhole: <= 6 differing bits leave >= 2 clean 4-bit blocks,
    // and that block pair is one of the 28 tables — so (pre-cap) the
    // blocked path must equal the all-pairs truth exactly
    val recall = Dedup.simhashRecallBlocked(docs, 6)
    assert(recall.filter(!col("found")).count() === 0L,
      "blocked banding missed a true pair")
    val truthSet = recall.select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
    val blockedSet = Dedup.simhashNearDupBlocked(docs, 6)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(blockedSet === truthSet)
    // the upgrade is measurable: the rotation heuristic must MISS
    // pairs on this corpus (else the fixture can't distinguish them)
    assert(Dedup.simhashRecall(docs, 6, 2).filter(!col("found")).count() > 0L,
      "fixture degenerate: rotations already find every pair")
  }

  test("minhash recall audit covers the exact-Jaccard truth") {
    val r = Dedup.minhashRecall(docs, 3, 0.5)
    // truth side IS the all-pairs reference, row-for-row
    assert(r.count() === Dedup.ngramJaccard(docs, 3, 0.5).count())
    // measured (not guaranteed): on this corpus the 8x4 banding at
    // t=0.5 catches every true pair — a regression in bands, caps,
    // or signatures shows up as found=false rows here
    assert(r.filter(!col("found")).count() === 0L)
  }

  test("ppjoin audit's kept rows are exactly the ppjoin pairs") {
    for (t <- Seq(0.5, 0.6)) {
      val audit = Dedup.ppjoinAudit(docs, 3, t)
      val kept = pairSet(audit.filter(col("kept"))
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
      assert(kept === pairSet(Dedup.ppjoin(docs, 3, t)),
        s"threshold $t: audit verify disagrees with ppjoin")
      // audit rows == candidate count: the verify drops nothing
      assert(audit.count() === Dedup.ppjoinCandidates(docs, 3, t).count())
    }
  }

  test("position filter prunes candidates without losing a single pair") {
    for (t <- Seq(0.5, 0.6)) {
      val pruned = Dedup.ppjoinCandidates(docs, 3, t).count()
      val allpairs = Dedup.ppjoinCandidates(docs, 3, t,
        positionFilter = false).count()
      // measured at sf0.001: 867 -> 29 (t=0.5), 120 -> 28 (t=0.6)
      assert(pruned * 2 < allpairs,
        s"t=$t: position bound prunes $allpairs -> $pruned, expected >2x")
      // and the full join on the pruned candidates stays exact
      // (the threshold-sweep test above re-proves this per threshold)
      val pairs = pairSet(Dedup.ppjoin(docs, 3, t))
      val exact = pairSet(Dedup.ngramJaccard(docs, 3, t))
      assert(pairs === exact)
      // the filtered candidates are a SUBSET of the AllPairs-grade
      // set (the w0 + group bounds only ever remove pairs)
      val candSet = Dedup.ppjoinCandidates(docs, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val allSet = Dedup.ppjoinCandidates(docs, 3, t,
        positionFilter = false).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(candSet.subsetOf(allSet))
      // and every true pair survives the candidate stage
      assert(exact.map(p => (p._1, p._2)).subsetOf(candSet))
    }
  }

  test("position bound keeps a pair sitting exactly at the threshold") {
    // |a| = |b| = 4 shingles, overlap 3: jaccard = 3/5 = 0.6 exactly —
    // the boundary case a float-rounded alpha could wrongly prune
    // 6 tokens -> 4 trigram shingles each; 3 shared, last differs
    val corpus = Seq(
      (1L, "w1 w2 w3 a b c"),
      (2L, "w1 w2 w3 a b d")
    ).toDF("doc_id", "text")
    val got = pairSet(Dedup.ppjoin(corpus, 3, 0.6))
    assert(got === Set((1L, 2L, 0.6)))
  }

  test("ppjoin never forms the all-pairs candidate space") {
    // identical docs (jaccard 1.0) plus unrelated filler: the prefix is
    // a single shingle, so candidates come only from that collision
    val corpus = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "acht neun zehn elf zwoelf dreizehn")) ++
      (10 to 40).map(i => (i.toLong, s"filler$i a$i b$i c$i d$i e$i")))
      .toDF("doc_id", "text")
    val got = pairSet(Dedup.ppjoin(corpus, 3, 0.9))
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("sorted-neighborhood: adjacent sort-key near-dups found, window respected") {
    // two docs sharing a long prefix sort adjacently and verify at
    // jaccard 6/8... compute: 10 shared tokens -> shingles mostly common
    val corpus = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "zzz completely different text here now okay fine sure")) ++
      (10 to 29).map(i => (i.toLong, s"filler$i x$i y$i z$i w$i v$i")))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(corpus, 3, 4, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
    // and the two-level distributed rank equals one global window:
    // pairs found by the operator are found by the oracle rule — the
    // full equality is the DuckDB gate; here pin window locality:
    // a pair > window apart in sort order is never emitted even if
    // identical (the documented SNM miss class)
    // near-dups at jaccard 7/11 whose sort keys diverge at token 2,
    // with 6 docs sorting strictly between them -> > 4 ranks apart
    val far = (Seq(
      (1L, "mmm aa common body one two three four five six seven"),
      (99L, "mmm zz common body one two three four five six seven")) ++
      (2 to 7).map(i => (i.toLong, s"mmm b$i separator text body qq rr ss tt uu")))
      .toDF("doc_id", "text")
    val farGot = Dedup.sortedNeighborhood(far, 3, 4, 0.6).collect()
    assert(!farGot.exists(r => r.getLong(0) == 1L && r.getLong(1) == 99L),
      "pairs beyond the window are the documented miss class")
  }

  test("snGlobalRank: a shared-prefix corpus still splits across buckets, " +
    "and the composed rank equals one global window") {
    import org.apache.spark.sql.expressions.Window
    // every document opens with the same 2000-char boilerplate — the
    // corpus shape that collapses any fixed key-prefix bucket rule
    // (r11's first-char buckets) into a single reducer; range-sampled
    // boundaries compare FULL keys and must still spread the rows
    val prefix = "x" * 2000
    val docs = (0 until 400).map { i =>
      (i.toLong, prefix + f" tail ${(i * 7919) % 100000}%05d body aaa bbb")
    }.toDF("doc_id", "text")
    val ranked = Dedup.snGlobalRank(docs)
    val nBuckets = ranked.select(col("__bucket")).distinct().count()
    assert(nBuckets > 1,
      s"range-sampled boundaries must split a shared-prefix corpus, got $nBuckets bucket(s)")
    val reference = docs
      .select(col("doc_id"), lower(col("text")).as("k"))
      .withColumn("rk_ref", row_number()
        .over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rk_ref"))
    val mismatches = ranked.select(col("doc_id"), col("rk"))
      .join(reference, "doc_id")
      .filter(col("rk") =!= col("rk_ref")).count()
    assert(mismatches === 0L,
      "two-level rank must equal the single global ROW_NUMBER")
  }

  test("sortedNeighborhood at minJaccard 0.0 never emits zero-overlap neighbors") {
    // the array-intersect projection verify scores EVERY candidate
    // pair (the old inner equi-join form produced no row at all for
    // zero overlap), so the degenerate 0.0 threshold must not surface
    // sort-adjacent documents with disjoint shingle sets
    val docs = Seq(
      (1L, "aaa bbb ccc ddd eee"),
      (2L, "aab qqq rrr sss ttt"), // sorts adjacent, zero 3-shingles shared
      (3L, "zzz yyy xxx www vvv"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(docs, 3, 4, 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 > 0.0),
      s"zero-overlap neighbors surfaced at the 0.0 threshold: ${got.mkString(",")}")
  }

  test("sortedNeighborhood finds a planted near-dup pair under a shared prefix") {
    val prefix = "y" * 2000
    val docs = ((0 until 60).map { i =>
      (i.toLong, prefix + f" tail ${i * 137}%05d body aaa bbb ccc ddd")
    } :+ (900L, prefix + " tail 99999 body aaa bbb ccc ddd")
      :+ (901L, prefix + " tail 99999 body aaa bbb ccc dzz"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(docs, 3, 4, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((900L, 901L)),
      "adjacent-in-sort near-dups must be found; spread tails must not pair")
  }

  test("edit-distance pairs find planted near-duplicates inside blocks") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val corpus = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")),       // dist 1
      (3L, base.replace("today", "tonite")),      // dist 4 tail edit
      (4L, "a completely different sentence that shares nothing with the fox story"),
      (5L, "Zebra " + base),                      // position-0 edit: the
                                                  // LAST-char pass finds it
      (6L, "Q" + base.dropRight(1) + "q")         // edited at BOTH ends:
                                                  // the residual escape class
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(corpus, maxDist = 8, bandWidth = 16,
      maxBlock = 64)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 1)))
    assert(got.exists { case (a, b, _) => (a, b) == (1L, 3L) })
    assert(!got.exists { case (a, b, _) => b == 4L || a == 4L })
    // doc 5 escaped the single-pass (first-char) blocking; the
    // (band, last-char) pass co-blocks it with doc 1 at distance 6
    assert(got.contains((1L, 5L, 6)))
    // doc 6 spends edits on BOTH anchor chars — the documented miss
    assert(!got.exists { case (a, b, _) => b == 6L || a == 6L })

    // the recall self-eval MEASURES that miss: the brute-force truth
    // side contains (1,6) at distance 2, and the blocked path's flag
    // marks it as the escape while the found pairs stay true
    val recall = Dedup.editDistanceRecall(corpus, maxDist = 8,
        bandWidth = 16, maxBlock = 64)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("found"))
      .as[(Long, Long, Int, Boolean)].collect().toSet
    assert(recall.contains((1L, 6L, 2, false)),
      s"both-ends escape not measured: $recall")
    assert(recall.contains((1L, 2L, 1, true)))
    assert(recall.contains((1L, 5L, 6, true)))
    // truth is a superset of the blocked result on any corpus
    assert(got.forall { case (a, b, d) => recall.contains((a, b, d, true)) })
  }

  test("normalized exact dedup folds case, accents, punctuation, spacing") {
    val corpus = Seq(
      (1L, "Café, Déjà-Vu!"),
      (2L, "cafe   deja vu"),
      (3L, "CAFE DEJA (vu)"),
      (4L, "completely different")
    ).toDF("doc_id", "text")
    val groups = Dedup.normalizedExact(corpus)
      .select(col("cnt"), col("keeper"))
      .as[(Long, Long)].collect().toSet
    assert(groups === Set((3L, 1L), (1L, 4L)),
      s"fold classes wrong: $groups")
    // and the raw exact dedup does NOT collapse them (the fold is the
    // point, not a rehash of the same operator)
    assert(Dedup.exact(corpus).count() === 4L)
  }

  test("edit-distance blocking requires bandWidth > maxDist") {
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs, maxDist = 16, bandWidth = 16)
    }
  }

  test("pmi collocations apply the integer cross-multiplied cutoff") {
    // "new york" always adjacent: c12=4, c1=c2=4, N=15 tokens
    // 4*15 = 60 >= 2*4*4 = 32 -> kept, pmi = ln(60/16) = ln 3.75
    val corpus = Seq(
      (1L, "new york is big"), (2L, "new york is old"),
      (3L, "new york won today"), (4L, "visit new york")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(corpus, minCount = 3, minRatio = 2)
      .filter(col("w1") === "new" && col("w2") === "york")
      .select(col("c12"), col("c1"), col("c2"), col("pmi"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (c12, c1, c2, pmi) = got.head
    assert((c12, c1, c2) === (4L, 4L, 4L))
    assert(math.abs(pmi - math.log(3.75)) < 1e-12)
  }

  test("readability counts words, sentences, and vowel-group syllables") {
    val corpus = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val row = TextAnalysis.readability(corpus)
      .select(col("n_words"), col("n_sentences"), col("n_syllables"),
        col("flesch"))
      .as[(Long, Long, Long, Double)].collect().head
    // 6 words; "sat." + "ran!" = 2 sentence runs; one vowel group each
    assert(row._1 === 6L)
    assert(row._2 === 2L)
    assert(row._3 === 6L)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(math.abs(row._4 - expected) < 1e-9)
  }

  test("readability gives vowel-less words one syllable") {
    val corpus = Seq((1L, "psst brr hmm")).toDF("doc_id", "text")
    val syl = TextAnalysis.readability(corpus)
      .select(col("n_syllables")).as[Long].collect().head
    assert(syl === 3L)
  }

  test("rake phrases score degree over frequency, hand case") {
    val corpus = Seq(
      (1L, "red apple the red apple"),
      (2L, "green pear the red apple")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.rakePhrases(corpus, Seq("the"), 2)
      .select(col("phrase"), col("n_words"), col("freq_phrase"),
        col("score"))
      .as[(String, Long, Long, Double)].collect()
    // only "red apple" reaches the frequency cutoff (3 occurrences);
    // red: freq 3 deg 6, apple: freq 3 deg 6 -> score 2 + 2 = 4
    assert(rows.length === 1)
    val (phrase, nw, fp, score) = rows.head
    assert(phrase === "red apple")
    assert(nw === 2L && fp === 3L)
    assert(math.abs(score - 4.0) < 1e-12)
  }

  test("zipf slope recovers a planted power law") {
    // term k repeated round(1000/k) times: ln c = ln 1000 - ln rank,
    // slope -1 up to rounding
    val rows = (1 to 50).flatMap { k =>
      Seq.fill(math.round(1000.0 / k).toInt)(s"term${"%02d".format(k)}")
    }
    val corpus = Seq((1L, rows.mkString(" "))).toDF("doc_id", "text")
    val (n, slope, icept) = TextAnalysis.zipfSlope(corpus, 200)
      .select(col("n_terms"), col("slope"), col("intercept"))
      .as[(Long, Double, Double)].collect().head
    assert(n === 50L)
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
    assert(math.abs(icept - math.log(1000.0)) < 0.02, s"intercept $icept")
  }
}
