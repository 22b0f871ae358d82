package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Sampling, Similarity, TextAnalysis}

/** Unit behavior of the round-3 curation operators: stratified
  * sampling, repetition-quality stats, PII scrubbing, int8
  * quantization, line-level dedup, URL canonicalization, relative
  * quality cutoff, and DSIR importance selection. Oracle parity is
  * covered by the declared queries; these pin the hand-checkable
  * semantics.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratified draws exactly k per stratum, deterministically") {
    val docs = (0 until 200).map(i => (i.toLong, s"lang${i % 4}"))
      .toDF("doc_id", "lang")
    val got = Sampling.stratified(docs, "lang", "doc_id", 5)
    val perStratum = got.groupBy("lang").count().collect()
    assert(perStratum.length === 4)
    assert(perStratum.forall(_.getLong(1) === 5L))
    // deterministic: same input → same member set
    val again = Sampling.stratified(docs, "lang", "doc_id", 5)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0L)
    // ranks are 1..k within each stratum
    assert(got.agg(min("sample_rank"), max("sample_rank")).head()
      .toSeq === Seq(1L, 5L))
  }

  test("stratified with k >= stratum size returns the whole stratum") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    assert(Sampling.stratified(docs, "lang", "doc_id", 10).count() === 3L)
  }

  test("temperatureSample flattens the head: integer quotas, exact ranks") {
    // 100 "big" + 9 "small": s = (10, 3), Σs = 13, N = 109,
    // B = 109·40 div 100 = 43 → t_big = 43·10 div 13 = 33,
    // t_small = 43·3 div 13 = 9 (the whole small stratum survives —
    // the τ=2 flattening at work: big keeps 33%, small keeps 100%)
    val docs = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 109).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val got = Sampling.temperatureSample(docs, "lang", "doc_id", 40,
      nBuckets = 8)
    val per = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per === Map("big" -> 33L, "small" -> 9L))
    assert(got.select("lang", "target_n").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("big" -> 33L, "small" -> 9L))
    // the two-level bucket rank is bit-identical to the one-reducer
    // window form (the oracle's shape)
    import org.apache.spark.sql.expressions.Window
    val plain = docs.withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(
          graft.functions.TextFunctions.hash60(col("doc_id").cast("string")),
          col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r"))
    val mismatch = got.join(plain, "doc_id")
      .filter(col("sample_rank") =!= col("r")).count()
    assert(mismatch === 0L)
    // partitioning-invariant: same member set from a 13-way repartition
    val again = Sampling.temperatureSample(docs.repartition(13), "lang",
      "doc_id", 40, nBuckets = 8)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0L
      && again.count() === got.count())
  }

  test("oovRate: per-language counts and exact rates under a tiny vocab") {
    // corpus term counts: a:2 b:2 d:2 c:1 → top-2 vocab (cnt desc,
    // term asc tiebreak) = {a, b}
    val docs = Seq((1L, "en", "a a b c"), (2L, "de", "b d d"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.oovRate(docs, 2).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert(en.getAs[Long]("n_tokens") === 4L)
    assert(en.getAs[Long]("n_oov") === 1L)      // c
    assert(en.getAs[Long]("n_oov_terms") === 1L)
    assert(en.getAs[Double]("oov_rate") === 0.25)
    val de = got("de")
    assert(de.getAs[Long]("n_tokens") === 3L)
    assert(de.getAs[Long]("n_oov") === 2L)      // d, d
    assert(de.getAs[Long]("n_oov_terms") === 1L)
    assert(de.getAs[Double]("oov_rate") === 2.0 / 3.0)
  }

  test("repetitionStats flags a repeated-bigram doc, keeps a clean one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),          // one bigram repeated 4x
      (2L, "one two three four five six seven"), // all bigrams unique
      (3L, "solo")                                // < 2 tokens: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === 2)
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_grams") === 4L)
    assert(r1.getAs[Long]("top_gram") === 4L)
    assert(r1.getAs[Double]("top_frac") === 1.0)
    assert(r1.getAs[Double]("dup_frac") === 1.0)
    assert(r1.getAs[String]("verdict") === "drop")
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_grams") === 6L)
    assert(r2.getAs[Long]("dup_grams") === 0L)
    assert(r2.getAs[String]("verdict") === "keep")
  }

  test("scrubPii redacts and counts emails, IPs, digit runs in stages") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org from 192.168.1.250 call 5551234567"),
      (2L, "nothing sensitive here"),
      (3L, "two mails a@b.co c@d.io ip 10.0.0.1 and 8.8.8.8")
    ).toDF("id", "text")
    val got = TextAnalysis.scrubPii(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_emails") === 1L)
    assert(r1.getAs[Long]("n_ips") === 1L)
    assert(r1.getAs[Long]("n_digit_runs") === 1L)
    assert(r1.getAs[String]("scrubbed") ===
      "mail <EMAIL> from <IP> call <NUM>")
    assert(got(2L).getAs[String]("scrubbed") === "nothing sensitive here")
    val r3 = got(3L)
    assert(r3.getAs[Long]("n_emails") === 2L)
    assert(r3.getAs[Long]("n_ips") === 2L)
    assert(r3.getAs[String]("scrubbed") ===
      "two mails <EMAIL> <EMAIL> ip <IP> and <IP>")
  }

  test("quantizeInt8 bounds values to [-127,127] and zeroes zero vectors") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Double]("scale") === 1.0 / 127)
    // max-magnitude element maps to ±127; others scale linearly
    assert(r1.getAs[Seq[Long]]("qvec") === Seq(64L, -127L, 32L, 0L))
    val r2 = got(2L)
    assert(r2.getAs[Double]("scale") === 0.0)
    assert(r2.getAs[Seq[Long]]("qvec") === Seq(0L, 0L, 0L, 0L))
  }

  test("dedupLines keeps first global occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "home\nunique one\nhome"),   // within-doc repeat of "home"
      (2L, "unique one\nfresh line"),   // cross-doc repeat of "unique one"
      (3L, "home")                      // every line already seen
    ).toDF("doc_id", "text")
    val got = Curation.dedupLines(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_lines") === 3L)
    assert(got(1L).getAs[Long]("n_kept") === 2L)
    assert(got(1L).getAs[String]("cleaned") === "home\nunique one")
    assert(got(2L).getAs[Long]("n_kept") === 1L)
    assert(got(2L).getAs[String]("cleaned") === "fresh line")
    assert(got(3L).getAs[Long]("n_kept") === 0L)
    assert(got(3L).getAs[String]("cleaned") === "")
  }

  test("dedupLines survives a mass-duplicate hot line (3000 copies)") {
    // every doc shares the boilerplate line; only doc 0 keeps it
    val docs = (0 until 3000).map(i => (i.toLong, s"boilerplate header\nunique $i"))
      .toDF("doc_id", "text").repartition(16)
    val got = Curation.dedupLines(docs, "doc_id", "text")
    assert(got.count() === 3000L)
    val keepers = got.filter($"n_kept" === 2L).select("doc_id").as[Long].collect()
    assert(keepers.toSeq === Seq(0L))
    assert(got.filter($"n_kept" === 1L).count() === 2999L)
  }

  test("normalizeUrl canonicalizes case, ports, utm params, slashes, fragments") {
    val urls = Seq(
      "HTTP://Ex.COM:80/a/?utm_source=x#frag",
      "http://ex.com/a",
      "https://Ex.com:443",
      "https://ex.com/?utm_a=1&utm_b=2",
      "https://ex.com/p?utm_x=1&q=2&utm_y=3#z"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = urls.select(col("id"), Curation.normalizeUrl(col("url")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "http://ex.com/a")
    assert(got(1L) === "http://ex.com/a")
    assert(got(2L) === "https://ex.com/")
    assert(got(3L) === "https://ex.com/")
    assert(got(4L) === "https://ex.com/p?q=2")
  }

  test("urlDedup groups crawl variants under one canonical key") {
    val df = Seq(
      (10L, "HTTPS://A.com/x/"), (11L, "https://a.COM/x"),
      (12L, "https://a.com/x#top"), (13L, "https://b.com/y")
    ).toDF("id", "url")
    val got = Curation.urlDedup(df, "id", "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("https://a.com/x" -> ((3L, 10L)),
                       "https://b.com/y" -> ((1L, 13L))))
  }

  test("qualityCutoff keeps docs at/above the corpus ttr quantile") {
    // ttr: 1.0, 1.0, 0.5, 0.25 → median interpolates to 0.75
    val docs = Seq(
      (1L, "a b c d"), (2L, "w x y z"),
      (3L, "a a b b"), (4L, "a a a b")
    ).toDF("doc_id", "text")
    val got = Curation.qualityCutoff(docs, 0.5)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(got.select("cutoff").head().getDouble(0) === 0.75)
  }

  test("deterministicShuffle: dense global rank, partitioning-invariant") {
    val docs = (1 to 200).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val got = graft.operators.Sampling.deterministicShuffle(docs, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense 1..N
    assert(got.map(_._3).sorted.toSeq === (1L to 200L))
    // rank order IS key order (ties impossible here; id breaks them anyway)
    val byRank = got.sortBy(_._3).map(t => (t._2, t._1)).toSeq
    assert(byRank === byRank.sorted)
    // same permutation regardless of input partitioning and bucket count
    val again = graft.operators.Sampling
      .deterministicShuffle(docs.repartition(13), 7L, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.map(t => t._1 -> t._3).toMap === again)
    // a different seed yields a different permutation
    val other = graft.operators.Sampling.deterministicShuffle(docs, 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.map(t => t._1 -> t._3).toMap !== other)
  }

  test("ngramFrequencyScore: hand-computed corpus bigram frequencies") {
    // corpus counts: "a b" -> 3 (2 in doc 1, 1 in doc 2), "b a" -> 1, "b c" -> 1
    val docs = Seq(1L -> "a b a b", 2L -> "a b c").toDF("doc_id", "text")
    val got = Curation.ngramFrequencyScore(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((3L, 7L, 7.0 / 3.0))) // grams: ab, ba, ab -> 3+1+3
    assert(got(2L) === ((2L, 4L, 2.0)))       // grams: ab, bc -> 3+1
  }

  test("bigramLmScore: hand-computed conditional probabilities, fluent > gibberish") {
    // corpus: doc 1 repeats one bigram ("a b" fluent), doc 2 is four
    // distinct words seen once each (gibberish). V = 6 distinct words.
    // bigram counts: (a,b)=3, (b,a)=2, (c,d)=(d,e)=(e,f)=1
    // context counts: a·=3, b·=2, c·=d·=e·=1
    val docs = Seq(1L -> "a b a b a b", 2L -> "c d e f")
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q(x: Double) = BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    // doc 1: bigrams ab,ba,ab,ba,ab -> 3x (3+1)/(3+6) + 2x (2+1)/(2+6)
    val d1 = ((q(4.0 / 9.0) * 3 + q(3.0 / 8.0) * 2).toDouble * 1000000.0) / 5
    // doc 2: cd,de,ef -> 3x (1+1)/(1+6)
    val d2 = (q(2.0 / 7.0) * 3).toDouble * 1000000.0 / 3
    assert(got(1L)._1 === 5L && got(2L)._1 === 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6, got(1L).toString)
    assert(math.abs(got(2L)._2 - d2) < 1e-6, got(2L).toString)
    // the LM property: fluent repetition outscores one-off word salad
    assert(got(1L)._2 > got(2L)._2)
  }

  test("knSmoothedLmScore: hand-computed interpolated KN, sums to 1 per context") {
    // corpus: doc 1 repeats bigrams (fluent), doc 2 is word salad.
    // bigram counts: (a,b)=3, (b,a)=2, (c,d)=(d,e)=(e,f)=1 → 5 types.
    // contexts: a·=3 (1 continuation), b·=2 (1), c·=d·=e·=1 (1 each).
    // continuations: N1+(·b)=N1+(·a)=N1+(·d)=N1+(·e)=N1+(·f)=1.
    val docs = Seq(1L -> "a b a b a b", 2L -> "c d e f")
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.knSmoothedLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q(x: Double) = BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    // term(a,b) = (3−.75)/3 + (.75·1/3)·(1/5) = 0.80
    // term(b,a) = (2−.75)/2 + (.75·1/2)·(1/5) = 0.70
    // term(c,d) = term(d,e) = term(e,f) = (1−.75)/1 + .75·(1/5) = 0.40
    val tAb = (3.0 - 0.75) / 3.0 + (0.75 * 1.0 / 3.0) * (1.0 / 5.0)
    val tBa = (2.0 - 0.75) / 2.0 + (0.75 * 1.0 / 2.0) * (1.0 / 5.0)
    val tCd = (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 5.0)
    val d1 = (q(tAb) * 3 + q(tBa) * 2).toDouble * 1000000.0 / 5
    val d2 = (q(tCd) * 3).toDouble * 1000000.0 / 3
    assert(got(1L)._1 === 5L && got(2L)._1 === 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6, got(1L).toString)
    assert(math.abs(got(2L)._2 - d2) < 1e-6, got(2L).toString)
    // fluent repetition outscores word salad under KN too
    assert(got(1L)._2 > got(2L)._2)
    // the KN normalization identity: for each context w1, discounted
    // observed mass + backoff mass over the FULL continuation vocab
    // (5 continuation words, each pcont = 1/5) sums to exactly 1 —
    // e.g. context a: 0.75 observed + (0.75·1/3)·(5·1/5) = 1.
    assert(math.abs((3.0 - 0.75) / 3.0 + (0.75 * 1.0 / 3.0) * 1.0 - 1.0) < 1e-12)
    assert(math.abs((2.0 - 0.75) / 2.0 + (0.75 * 1.0 / 2.0) * 1.0 - 1.0) < 1e-12)
  }

  test("knSmoothedLmScore rewards versatile continuations over single-context ones") {
    // the "San Francisco" property: york follows 4 distinct contexts
    // (new/old/big/q1) while fran — though seen as a continuation
    // just as often — only ever follows 2 (san/q2). The probe docs
    // score one bigram each with equal observed counts and equal
    // context strength (c1=1), so the continuation term N1+(·w2)
    // alone decides; the versatile continuation must win.
    val docs = Seq(
      10L -> "new york", 11L -> "old york", 12L -> "big york",
      13L -> "san fran san fran san fran",
      20L -> "q1 york", 21L -> "q2 fran")
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.knSmoothedLmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(20L) > got(21L),
      s"york (4 contexts) should outscore fran (2 contexts): $got")
  }

  test("gopherRepetition: duplicate lines and duplicated n-grams trip thresholds") {
    val clean = "one two three four five six seven eight nine ten"
    val dupLines = Seq.fill(10)("the same line again").mkString("\n")
    val spam = Seq.fill(30)("spam").mkString(" ")
    val docs = Seq((1L, clean), (2L, dupLines), (3L, spam))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.gopherRepetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def f(id: Long, c: String) = got(id).getDouble(got(id).fieldIndex(c))
    def v(id: Long) = got(id).getString(got(id).fieldIndex("verdict"))
    // clean doc: no duplicate lines, no repeated grams anywhere
    assert(f(1L, "dup_line_frac") === 0.0)
    assert(f(1L, "dup_5_gram_char_frac") === 0.0)
    assert(v(1L) === "keep")
    // every line is a duplicate of every other
    assert(f(2L, "dup_line_frac") === 1.0)
    assert(v(2L) === "drop")
    // 26 identical 5-grams: duplicated-gram char mass dominates
    assert(f(3L, "dup_5_gram_char_frac") > 0.15)
    assert(f(3L, "top_2_gram_char_frac") > 0.20)
    assert(v(3L) === "drop")
  }

  test("gopherRules: each rule trips on its designed violation") {
    val good = "the and " + Seq.fill(48)("word").mkString(" ") // 50 words
    val short = "the and word word"                            // 4 words
    val bullets = Seq.fill(10)("- item one.").mkString("\n")   // all bullet lines
    val numeric = "the and " + (1 to 48).mkString(" ")         // 48/50 words non-alpha
    val docs = Seq((1L, good), (2L, short), (3L, bullets), (4L, numeric))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(got(1L).fieldIndex("verdict")))
    assert(!got(2L).getBoolean(got(2L).fieldIndex("r_wordcount")))
    assert(!got(3L).getBoolean(got(3L).fieldIndex("r_bullet")))
    assert(!got(4L).getBoolean(got(4L).fieldIndex("r_alpha")))
    assert(got(1L).getLong(got(1L).fieldIndex("n_words")) === 50L)
    // violations conjoin into the verdict
    Seq(2L, 3L, 4L).foreach(id =>
      assert(!got(id).getBoolean(got(id).fieldIndex("verdict"))))
  }

  test("c4LineFilter keeps punctuated >=3-word lines, in order") {
    val text = Seq(
      "This is a proper sentence.",   // kept
      "short.",                       // < 3 words
      "no terminal punctuation here", // no [.!?\"] ending
      "Another good line with words!",// kept
      ""                              // empty
    ).mkString("\n")
    val got = Curation.c4LineFilter(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(got.getLong(1) === 5L) // n_lines
    assert(got.getLong(2) === 2L) // n_kept
    assert(got.getString(3) ===
      "This is a proper sentence.\nAnother good line with words!")
  }

  test("approx qualityCutoff tier stays within tolerance of exact") {
    // 100 docs with ttr spread over [1/10, 1]: doc k repeats one word
    // k times then pads distinct words to length 10
    val docs = (1 to 100).map { k =>
      val rep = Seq.fill(k % 10 + 1)("w")
      val pad = (1 until (10 - k % 10)).map(i => s"u$i$k")
      (k.toLong, (rep ++ pad).mkString(" "))
    }.toDF("doc_id", "text")
    val exact = Curation.qualityCutoff(docs, 0.7)
    val approx = Curation.qualityCutoff(docs, 0.7, exact = false)
    val cutE = exact.select("cutoff").head().getDouble(0)
    val cutA = approx.select("cutoff").head().getDouble(0)
    // at accuracy=10000 over 100 rows the sketch is exact up to ties
    assert(math.abs(cutE - cutA) <= 0.1, s"cutoff drifted: $cutE vs $cutA")
    val keptE = exact.select("doc_id").as[Long].collect().toSet
    val keptA = approx.select("doc_id").as[Long].collect().toSet
    // sets differ only near the boundary
    assert((keptE diff keptA).size + (keptA diff keptE).size <= 15)
  }

  test("dsirSelect votes docs toward the target bigram distribution") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "alpha beta gamma delta", false)
    ).toDF("doc_id", "text", "is_target")
    val got = Curation.dsirSelect(docs, col("is_target")).collect()
      .map(r => r.getLong(0) -> r).toMap
    // target-leaning buckets: "alpha beta" (4·12>5·6), "beta alpha"
    // (2·12>2·6); raw-only grams are not leaning.
    assert(got(1L).getAs[Long]("n_grams") === 3L)
    assert(got(1L).getAs[Long]("n_target") === 3L)
    assert(got(1L).getAs[Boolean]("selected"))
    assert(got(3L).getAs[Long]("n_target") === 0L)
    assert(!got(3L).getAs[Boolean]("selected"))
    // doc 4 has 1 leaning gram of 3: 1·12 > 3·6 is false
    assert(got(4L).getAs[Long]("n_target") === 1L)
    assert(!got(4L).getAs[Boolean]("selected"))
  }

  test("packSequences cuts exact seqLen chunks across doc boundaries") {
    // 5 + 4 + 3 = 12 tokens, seqLen 5 → chunks of 5, 5, 2
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h i"), (3L, "j k l")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, 5L).orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 1L, 1L, 5L),   // doc 1 exactly fills seq 0
      (1L, 2L, 2L, 3L, 5L),   // doc 2 (4) + first token of doc 3
      (2L, 1L, 3L, 3L, 2L)))  // doc 3's remaining 2 tokens
    // token conservation at any seqLen
    val total = TextAnalysis.packSequences(docs, 7L)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(total === 12L)
  }

  test("sourceOverlap counts distinct shared lines per source pair") {
    val df = Seq(
      ("s1", "common\nonly one"), ("s1", "common\nother"),
      ("s2", "common\nshared two"), ("s3", "shared two\nsolo")
    ).toDF("source", "text")
    val got = Dedup.sourceOverlap(df, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "common" repeats inside s1 but counts once per pair
    assert(got === Map(("s1", "s2") -> 1L, ("s2", "s3") -> 1L))
  }

  test("mixSources keeps a deterministic per-source fraction") {
    val docs = (0 until 2000).map(i => (i.toLong, s"src${i % 2}"))
      .toDF("doc_id", "source")
    val weights = Seq(("src0", 100L), ("src1", 900L))
      .toDF("source", "rate_permille")
    val got = Sampling.mixSources(docs, weights)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates are statistical but with 1000 docs/source the md5 split
    // lands well inside these bands; determinism is exact
    assert(bySrc("src0") > 50L && bySrc("src0") < 180L, bySrc.toString)
    assert(bySrc("src1") > 800L && bySrc("src1") < 980L, bySrc.toString)
    val again = Sampling.mixSources(docs.repartition(13), weights)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0L)
    assert(again.count() === got.count())
  }

  test("corpusStats buckets by exact integer log2 of token count") {
    val docs = Seq(
      (1L, "a", "en"),                      // 1 token  → class 0
      (2L, "a b c", "en"),                  // 3 tokens → class 1
      (3L, "a b c d", "en"),                // 4 tokens → class 2
      (4L, "w x y z", "de")                 // 4 tokens → class 2
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.corpusStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("en", 0L)) === ((1L, 1L, 1L)))
    assert(got(("en", 1L)) === ((1L, 3L, 5L)))
    assert(got(("en", 2L)) === ((1L, 4L, 7L)))
    assert(got(("de", 2L)) === ((1L, 4L, 7L)))
  }

  test("cdcChunks conserves tokens and keeps chunk ids contiguous") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")),  // identical doc
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, 4).collect()
    // token conservation per doc
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getAs[Long]("n_tok")).sum === 40L)
    assert(byDoc(3L).map(_.getAs[Long]("n_tok")).sum === 4L)
    // contiguous chunk ids from 0
    byDoc.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("chunk")).sorted
      assert(ids.toSeq === ids.indices.map(_.toLong))
    }
    // identical docs produce identical fingerprint sequences → every
    // chunk of doc 1 is a duplicate
    val dups = Dedup.cdcDupChunks(docs, 4).collect()
    val doc1Fps = byDoc(1L).map(_.getAs[String]("fp")).toSet
    assert(doc1Fps.subsetOf(dups.map(_.getString(0)).toSet))
    dups.filter(r => doc1Fps.contains(r.getString(0)))
      .foreach(r => assert(r.getAs[Long]("n_docs") >= 2L))
  }

  test("tokenize maps tokens to vocab ranks with 0 for OOV, in order") {
    val docs = Seq(
      (1L, "red red blue rare"), (2L, "red blue blue")
    ).toDF("doc_id", "text")
    // vocab(2): red cnt 3 → id 1, blue cnt 3 → tie broken by term:
    // blue < red, so blue = 1, red = 2; "rare" is OOV → 0
    val got = TextAnalysis.tokenize(docs, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(1L) === ((4L, "2,2,1,0")))
    assert(got(2L) === ((3L, "2,1,1")))
  }

  test("shardManifest checksums are partitioning-invariant and tamper-evident") {
    val docs = (1 to 60).map(i => (i.toLong, s"document body number $i words"))
      .toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.shardManifest(df, 50).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toSeq
    val m1 = manifest(docs)
    assert(m1.nonEmpty && m1.map(_._2._1).sum === 60L)
    // XOR checksum must not depend on partition layout or row order
    assert(manifest(docs.repartition(7)) === m1)
    // a single flipped document (same token count, so the pack
    // boundaries stay put) changes exactly its shard's checksum
    val tampered = docs.withColumn("text",
      when($"doc_id" === 30L, lit("tampered body number 30 words"))
        .otherwise($"text"))
    val m2 = manifest(tampered).toMap
    val changed = m1.filter { case (s, v) => m2(s) !== v }
    assert(changed.length === 1, changed.toString)
  }

  test("greedyPieces segments by longest vocab prefix with char UNKs") {
    val docs = Seq(
      (1L, "hello hello hello world world cat"),
      (2L, "helloing")
    ).toDF("doc_id", "text")
    // k=2 vocab: top words {hello(3), world(2)}; top 3-char prefixes
    // by occurrence weight {hel(4), wor(2)} → vocab {hello,world,hel,wor}
    // doc1: hello/world are single pieces, cat = 3 char-UNKs
    // doc2: helloing = [hello][i][n][g] — longest match wins over hel
    val got = TextAnalysis.greedyPieces(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((6L, 8L, 3L)))
    assert(got(2L) === ((1L, 4L, 3L)))
  }

  test("vocabTopK orders by count then term and carries document frequency") {
    val docs = Seq(
      (1L, "red red blue"), (2L, "red blue green")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("red", 3L, 2L), ("blue", 2L, 2L)))
  }

  test("lengthBatches bounds batch size and padding waste") {
    val docs = (1 to 200).map(i =>
      (i.toLong, (1 to (i % 40 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lengthBatches(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 200)
    // every batch: <= 8 docs, one length class, max/min token ratio < 2
    got.groupBy(t => (t._3, t._4)).foreach { case ((cls, b), members) =>
      assert(members.length <= 8, s"class $cls batch $b overfull")
      val toks = members.map(_._2)
      assert(toks.max < 2 * toks.min,
        s"padding waste in class $cls batch $b: $toks")
    }
    // batches fill densely: within a class only the last batch is partial
    got.groupBy(_._3).foreach { case (cls, members) =>
      val sizes = members.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.init.forall(_ === 8), s"class $cls sparse batches: $sizes")
    }
  }

  test("int8TopK ranks a near-identical vector above an orthogonal one") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (12L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val query = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.int8TopK(corpus, query, 2)
      .orderBy("rn").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(10L, 12L))
  }

  test("unimaxSample water-fills: tails repeat to the epoch cap, head absorbs the rest") {
    // 100 "big" + 10 "small", epochs = 2, budget = 150% → B = 165,
    // sorted by cap: small (cap 20) takes min(20, 165 div 2 = 82) = 20
    // — its WHOLE data twice, never more (the UniMax signature) —
    // then big takes min(200, 145 div 1) = 145: one full epoch
    // (n_copies ≥ 1 for all 100) + 45 remainder docs at n_copies = 2.
    val docs = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val got = Sampling.unimaxSample(docs, "lang", "doc_id",
      budgetPct = 150, epochs = 2, nBuckets = 8)
    val copies = got.groupBy("lang").agg(
        sum("n_copies").as("c"), count(lit(1)).as("n"),
        max("n_copies").as("mx"), min("n_copies").as("mn"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // quota is met EXACTLY by Σ n_copies; every small doc selected twice
    assert(copies("small") === ((20L, 10L, 2L, 2L)))
    assert(copies("big") === ((145L, 100L, 2L, 1L)))
    // remainder goes to the smallest md5-ranks: the 45 double-counted
    // big docs are exactly ranks 1..45
    val doubled = got.filter(col("lang") === "big" && col("n_copies") === 2)
      .agg(min("sample_rank"), max("sample_rank"), count(lit(1))).head()
    assert(doubled.toSeq === Seq(1L, 45L, 45L))
    // partitioning-invariant
    val again = Sampling.unimaxSample(docs.repartition(13), "lang",
      "doc_id", budgetPct = 150, epochs = 2, nBuckets = 8)
    assert(got.select("doc_id", "n_copies")
      .except(again.select("doc_id", "n_copies")).count() === 0L
      && again.count() === got.count())
  }

  test("unimaxSample never exceeds the epoch cap even with surplus budget") {
    // budget 1000% of a 10-doc corpus, epochs 3 → every language is
    // capped at 3 passes; surplus budget goes unspent
    val docs = (0 until 10).map(i => (i.toLong, s"l${i % 2}"))
      .toDF("doc_id", "lang")
    val got = Sampling.unimaxSample(docs, "lang", "doc_id",
      budgetPct = 1000, epochs = 3, nBuckets = 4)
    assert(got.agg(max("n_copies")).head().getLong(0) === 3L)
    assert(got.agg(sum("n_copies")).head().getLong(0) === 30L)
  }

  test("hashEmbed: signed bucket counts reconstruct exactly and drop zero sums") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.hashEmbed(docs, 16)
    // reference computation: same hashes, driver-side
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def sgn(t: String): Long = if (h60("s:" + t) % 2 == 0) 1L else -1L
    val expect = Seq(1L -> Seq("a", "a", "b"), 2L -> Seq("a", "c"))
      .flatMap { case (id, ts) => ts.map(t => ((id, h60(t) % 16), sgn(t))) }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .filter(_._2 != 0L)
      .map { case ((id, dim), v) => (id, dim, v) }.toSet
    val gotSet = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSet === expect)
    // partitioning-invariant (hash-agg order never leaks)
    val again = TextAnalysis.hashEmbed(docs.repartition(7), 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === gotSet)
  }

  test("nbQualityModel votes match a driver-side reconstruction, both classes") {
    // two sharply separated vocabularies under an explicit label
    val docs = Seq(
      (1L, "good fine nice good", true), (2L, "good nice fine", true),
      (3L, "bad ugly junk bad junk", false), (4L, "bad ugly", false),
      (5L, "good bad", true)).toDF("doc_id", "text", "lbl")
    val dims = 16
    val got = Curation.nbQualityModel(docs, dims, label = col("lbl"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val toks = Seq(
      (Seq("good", "fine", "nice", "good"), true),
      (Seq("good", "nice", "fine"), true),
      (Seq("bad", "ugly", "junk", "bad", "junk"), false),
      (Seq("bad", "ugly"), false),
      (Seq("good", "bad"), true))
    val counts = toks.flatMap { case (ts, l) => ts.map(t => (h60(t) % dims, l)) }
      .groupBy(_._1).map { case (dim, xs) =>
        dim -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val tPos = counts.values.map(_._1).sum
    val tNeg = counts.values.map(_._2).sum
    val expect = counts.map { case (dim, (p, n)) =>
      val l = BigInt(p + 1) * BigInt(tNeg + dims)
      val r = BigInt(n + 1) * BigInt(tPos + dims)
      dim -> (p, n, l.compare(r).toLong)
    }
    assert(got === expect)
    // a pure-"good" bucket votes +1, a pure-"bad" bucket votes -1
    assert(got(h60("fine") % dims)._3 === 1L)
    assert(got(h60("junk") % dims)._3 === -1L)
  }

  test("nbQualityScore sums votes per doc and Σ(n_pos+n_neg) = total tokens") {
    val docs = Seq(
      (1L, "good fine nice good", true), (2L, "good nice fine", true),
      (3L, "bad ugly junk bad junk", false), (4L, "bad ugly", false),
      (5L, "good bad", true)).toDF("doc_id", "text", "lbl")
    val model = Curation.nbQualityModel(docs, 16, label = col("lbl"))
    assert(model.agg(sum(col("n_pos") + col("n_neg"))).head().getLong(0)
      === 16L) // 4+3+5+2+2 tokens
    // expected score = Σ model votes over each doc's token buckets
    // (votes read back from the model, so hash collisions at dims=16
    // are accounted for, not assumed away)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val votes = model.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val toks = Map(1L -> Seq("good", "fine", "nice", "good"),
      2L -> Seq("good", "nice", "fine"),
      3L -> Seq("bad", "ugly", "junk", "bad", "junk"),
      4L -> Seq("bad", "ugly"), 5L -> Seq("good", "bad"))
    val expect = toks.map { case (id, ts) =>
      id -> ts.map(t => votes(h60(t) % 16)).sum }
    val scored = Curation.nbQualityScore(docs, 16, label = col("lbl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored === expect)
    // n_tok conservation: Σ n_tok = corpus tokens
    val nTok = Curation.nbQualityScore(docs, 16, label = col("lbl"))
      .agg(sum("n_tok")).head().getLong(0)
    assert(nTok === 16L)
    // partitioning invariance
    val again = Curation.nbQualityScore(docs.repartition(7), 16,
      label = col("lbl")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === scored)
  }

  test("nbConfusion on a separable corpus recovers the labels exactly") {
    val docs = Seq(
      (1L, "good fine nice good", true), (2L, "good nice fine", true),
      (3L, "bad ugly junk bad junk", false), (4L, "bad ugly", false))
      .toDF("doc_id", "text", "lbl")
    val got = Curation.nbConfusion(docs, 16, label = col("lbl"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    assert(got === Map((true, true) -> 2L, (false, false) -> 2L))
  }

  test("cmsEstimate is a one-sided overestimate, exact when collision-free") {
    val docs = Seq((1L, "a a a b b c d"), (2L, "a b e f")).toDF("doc_id", "text")
    // wide sketch: no collisions plausible over 6 terms → est == exact
    val wide = TextAnalysis.cmsEstimate(docs, width = 4096, depth = 4, k = 6)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(wide.forall { case (_, (exact, est)) => est === exact })
    assert(wide.toMap.apply("a")._1 === 4L)
    // brutally narrow sketch: still never underestimates
    val narrow = TextAnalysis.cmsEstimate(docs, width = 2, depth = 2, k = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(narrow.forall { case (exact, est) => est >= exact })
  }

  test("goodTuring emits exact rationals over the spectrum") {
    val docs = Seq((1L, "a a a b b c"), (2L, "c d")).toDF("doc_id", "text")
    // counts a:3 b:2 c:2 d:1 → spectrum {1→1, 2→2, 3→1}
    // r=1: n_r=1, n_r1=2, num=(1+1)·2=4;  r=2: n_r=2, n_r1=1, num=3
    val got = TextAnalysis.goodTuring(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(1L -> (1L, 2L, 4L), 2L -> (2L, 1L, 3L)))
  }

  test("freqSpectrum conserves tokens and distinct terms") {
    val docs = Seq((1L, "a a a b b c"), (2L, "c d")).toDF("doc_id", "text")
    // counts: a:3 b:2 c:2 d:1 → spectrum {1→1, 2→2, 3→1}
    val got = TextAnalysis.freqSpectrum(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // invariants any corpus must satisfy: Σ c·n_terms = total tokens,
    // Σ n_terms = |vocab|
    assert(got.map { case (c, n) => c * n }.sum === 8L)
    assert(got.values.sum === 4L)
  }

  test("vocabGrowth: first-seen attribution, monotone cumulative, totals") {
    // doc 1 brings {a,b}; doc 2 brings {c}; doc 3 brings nothing new;
    // doc 4 brings {d}
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a c"), (4L, "d a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs).orderBy("first_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 1L, 3L), (4L, 1L, 4L)))
  }

  test("tierByScore is bit-identical to the global-window NTILE(3) it replaces") {
    import org.apache.spark.sql.expressions.Window
    // every NTILE regime: N < 3 (each row its own tile), N % 3 ∈
    // {0,1,2}, heavy score ties (the doc_id tie-break carries the
    // order), and N far above the partition count so every range
    // bucket holds many rows
    for (n <- Seq(1, 2, 3, 4, 5, 30, 100, 257)) {
      val df = (1 to n).map(i => (i.toLong, (i % 7).toDouble))
        .toDF("doc_id", "s")
      val exp = df.withColumn("tier",
          element_at(lit(Array("head", "middle", "tail")),
            ntile(3).over(Window.orderBy(col("s").desc, col("doc_id")))))
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      val got = TextAnalysis.tierByScore(df, "s")
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      assert(got === exp, s"n=$n")
    }
  }

  test("langVocabOverlap: exact intersections, unordered pairs once") {
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "c d"),
      (3L, "de", "c d e"), (4L, "fr", "x y"))
      .toDF("doc_id", "lang", "text")
    val got = Curation.langVocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en∩de = {c,d}; fr shares nothing → no fr rows at all
    assert(got === Map(("de", "en") -> (2L, 3L, 4L)))
    // a < b ordering means the (en,de) pair appears exactly once
    assert(got.keySet.forall { case (a, b) => a < b })
  }

  test("dpCounts: exact counts intact, noise deterministic and finite") {
    val docs = (0 until 60).map(i => (i.toLong, s"lang${i % 3}", "x"))
      .toDF("doc_id", "lang", "text")
    val got = Curation.dpCounts(docs, epsilon = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.values.map(_._1).sum === 60L)
    got.values.foreach { case (n, noisy) =>
      assert(!noisy.isNaN && !noisy.isInfinite)
      assert(noisy !== n.toDouble) // Laplace noise is a.s. nonzero
    }
    // seeded: a re-run and a repartitioned run release identical noise
    val again = Curation.dpCounts(docs.repartition(5), epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got.foreach { case (l, (_, noisy)) => assert(again(l) === noisy) }
  }

  test("bigramLmCrossScore: train-only counts, explicit unseen backoff") {
    // train: "a b a b" → c12(a,b)=2, c12(b,a)=1; c1(a)=2, c1(b)=1; V=2
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c"), (11L, "c d")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmCrossScore(train, score).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc10: (a,b) seen → (2+1)/(2+2)=0.75; (b,c) unseen → (0+1)/(1+2)
    assert(got(10L)._1 === 2L)
    assert(got(10L)._2 === 1L)
    assert(math.abs(got(10L)._3 - (0.75 + 1.0 / 3) / 2 * 1e6) < 1e-6)
    // doc11: (c,d) unseen AND novel context → (0+1)/(0+2) = 0.5
    assert(got(11L) === ((1L, 1L, 500000.0)))
    // the model never learns from the score side: re-scoring with the
    // score docs appended to train changes doc10's probability
    val self = TextAnalysis.bigramLmCrossScore(
      train.union(score), score).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(self(10L) !== got(10L)._3)
  }

  test("boilerplateStrip removes ALL occurrences per source, first included") {
    // srcA: "NAV" appears in 3/4 docs (≥ half, ≥ 2 docs) → boilerplate.
    // srcB has ONE doc containing "NAV" → below both thresholds there:
    // the same line text survives in srcB (per-source scoping).
    val docs = Seq(
      (1L, "srcA", "NAV\nalpha"), (2L, "srcA", "NAV\nbeta"),
      (3L, "srcA", "gamma\nNAV"), (4L, "srcA", "delta\nepsilon"),
      (5L, "srcB", "NAV\nzeta"), (6L, "srcB", "eta\ntheta"))
      .toDF("doc_id", "source", "text")
    val got = Curation.boilerplateStrip(docs, "doc_id", "source", "text",
        fracNum = 1, fracDen = 2, minDocs = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // unlike first-seen dedup, doc 1 (the FIRST occurrence) loses NAV too
    assert(got(1L) === ((2L, 1L, 5L, "alpha")))
    assert(got(2L) === ((2L, 1L, 4L, "beta")))
    assert(got(3L) === ((2L, 1L, 5L, "gamma")))
    assert(got(4L) === ((2L, 0L, 12L, "delta\nepsilon")))
    // srcB keeps its NAV: 1 of 2 docs is below minDocs=2
    assert(got(5L) === ((2L, 0L, 7L, "NAV\nzeta")))
    assert(got(6L) === ((2L, 0L, 8L, "eta\ntheta")))
  }

  test("boilerplateStrip: doc of pure boilerplate emits cleaned = ''") {
    val docs = Seq(
      (1L, "s", "NAV"), (2L, "s", "NAV"), (3L, "s", "NAV\nreal"))
      .toDF("doc_id", "source", "text")
    val got = Curation.boilerplateStrip(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(4)))
      .toMap
    assert(got(1L) === ((1L, "")))
    assert(got(3L) === ((1L, "real")))
  }

  test("sourceAudit counts exact dups and language spread per source") {
    val docs = Seq(
      (1L, "sA", "en", "same text"), (2L, "sA", "de", "same text"),
      (3L, "sA", "en", "other"), (4L, "sB", "fr", "unique"))
      .toDF("doc_id", "source", "lang", "text")
    val got = Curation.sourceAudit(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("sA") === ((3L, 2L, 1L, 2L, 23L)))
    assert(got("sB") === ((1L, 1L, 0L, 1L, 6L)))
  }

  test("nbCalibration: bins partition the corpus, counts reconcile") {
    val docs = (0 until 80).map { i =>
      val words = if (i % 2 == 0) ("w" + (i % 7) + " ") * 60 else "short text"
      (i.toLong, words.trim)
    }.toDF("doc_id", "text")
    val label = size(split(col("text"), " ", -1)).cast("long") >= 50L
    val bins = 10
    val got = Curation.nbCalibration(docs, 16, bins, label).collect()
    assert(got.map(_.getLong(1)).sum === 80L)
    got.foreach { r =>
      val (bin, n, lk, pk, ok) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0L && bin < bins.toLong)
      assert(lk <= n && pk <= n && ok <= n)
    }
    // agreement total matches the confusion matrix's diagonal
    val conf = Curation.nbConfusion(docs, 16, label).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val diag = conf.collect { case ((a, b), c) if a == b => c }.sum
    assert(got.map(_.getLong(4)).sum === diag)
  }

  test("nbAuc equals the quadratic pairwise Mann-Whitney definition") {
    val docs = (0 until 80).map { i =>
      val words = if (i % 2 == 0) ("w" + (i % 7) + " ") * 60 else "short text"
      (i.toLong, words.trim)
    }.toDF("doc_id", "text")
    val label = size(split(col("text"), " ", -1)).cast("long") >= 50L
    val row = Curation.nbAuc(docs, 16, label).head()
    val (nPos, nNeg, num2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    // quadratic reference: every (pos, neg) pair compared directly
    val scored = Curation.nbQualityScore(docs, 16, label)
      .join(docs.select(col("doc_id"), label.as("lk")), "doc_id")
      .select(col("score"), col("lk")).as[(Long, Boolean)].collect()
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    val ref2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert((nPos, nNeg) === (pos.length.toLong, neg.length.toLong))
    assert(num2 === ref2, "score-group counting diverged from pairwise")
    assert(math.abs(auc - ref2.toDouble / (2.0 * pos.length * neg.length))
      < 1e-15)
    // the gate was trained on these labels: it must rank better than
    // a coin flip on them
    assert(auc > 0.5, s"AUC $auc")
  }

  test("assignSplits is hash-stable: membership survives corpus growth") {
    val small = (0 until 200).map(i => (i.toLong, "en", "t"))
      .toDF("doc_id", "lang", "text")
    val large = (0 until 400).map(i => (i.toLong, "en", "t"))
      .toDF("doc_id", "lang", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(df, 100, 100).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val (ms, ml) = (m(small), m(large))
    // every original doc keeps its split when the corpus doubles
    ms.foreach { case (id, s) => assert(ml(id) === s) }
    assert(ms.values.toSet.subsetOf(Set("train", "val", "test")))
    // a different salt namespace reshuffles membership
    val other = Sampling.assignSplits(small, 100, 100, salt = "other")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(ms.exists { case (id, s) => other(id) != s })
  }

  test("splitAudit totals reconcile with the corpus") {
    val docs = (0 until 300).map(i => (i.toLong, "lang" + (i % 3), "abcd"))
      .toDF("doc_id", "lang", "text")
    val got = Sampling.splitAudit(docs, 50, 50).collect()
    assert(got.map(_.getLong(2)).sum === 300L)
    assert(got.map(_.getLong(3)).sum === 1200L)
  }

  test("pieceFertility reconciles with greedyPieces per-doc sums") {
    val docs = Seq(
      (1L, "en", "the quick brown fox"), (2L, "en", "the the the"),
      (3L, "de", "der schnelle fuchs"))
      .toDF("doc_id", "lang", "text")
    val fert = TextAnalysis.pieceFertility(docs, 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val gp = TextAnalysis.greedyPieces(docs, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fert("en")._1 === 2L)
    assert(fert("en")._2 === gp(1L)._1 + gp(2L)._1)
    assert(fert("en")._3 === gp(1L)._2 + gp(2L)._2)
    assert(fert("de")._1 === 1L)
    // fertility ratio is pieces/words exactly
    val row = TextAnalysis.pieceFertility(docs, 5)
      .filter(col("lang") === "en").head()
    assert(row.getAs[Double]("pieces_per_word") ===
      row.getAs[Long]("n_pieces").toDouble / row.getAs[Long]("n_words"))
  }

  test("weightedSample: heavy rows effectively always win; zero-weight dies") {
    import spark.implicits._
    // one row a million times heavier than 999 peers: key ln(u)/w is
    // ~0 for it, so it must be in any top-100; weight 0 is excluded
    val df = ((1L to 999L).map(i => (i, 10L)) :+ (1000L, 10000000L) :+
      (1001L, 0L)).toDF("doc_id", "wt")
    val got = Sampling.weightedSample(df, "doc_id", col("wt"), 100)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got.contains(1000L))
    assert(!got.contains(1001L))
    assert(got.size === 100)
    // determinism: same input order-independent
    val again = Sampling.weightedSample(df.repartition(7), "doc_id",
      col("wt"), 100).select(col("doc_id")).as[Long].collect().toSet
    assert(again === got)
  }

  test("tokenEntropy: uniform tokens hit ln(n), repeats drop entropy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // uniform over 4 types: H = ln 4, norm = 1
      (2L, "a a a a"),   // single type: H = 0, norm = 0
      (3L, "a a b b")    // uniform over 2: H = ln 2, norm = 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(docs)
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("entropy"), col("norm_entropy"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L)._2 === 4L && r(1L)._3 === 4L)
    assert(math.abs(r(1L)._4 - math.log(4.0)) < 1e-12)
    assert(math.abs(r(1L)._5 - 1.0) < 1e-12)
    assert(r(2L)._4 === 0.0 && r(2L)._5 === 0.0)
    assert(math.abs(r(3L)._4 - math.log(2.0)) < 1e-12)
  }

  test("knBucketsAtRest: standing model == per-query aggregation, and a regenerated corpus retrains") {
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = Files.createTempDirectory("graft-knmodel").toString
    assert(!TextAnalysis.knModelFresh(spark, path, docs))
    val atRest = TextAnalysis.knBucketsAtRest(docs, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(TextAnalysis.knModelFresh(spark, path, docs))
    val fresh = TextAnalysis.knBuckets(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    // bit-identical: the stored counts ARE the aggregates, and the
    // per-bigram term is the same fixed-shape double tree
    assert(atRest === fresh)
    assert(atRest.nonEmpty)
    // a regenerated corpus under the same name/row-count reads stale
    // (content signature) and the next call retrains
    import org.apache.spark.sql.functions.{col, concat, lit}
    val regen = docs.withColumn("text", concat(col("text"), lit(" x")))
    assert(!TextAnalysis.knModelFresh(spark, path, regen))
  }
}
