package graft

import java.time.LocalDate

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.Dates
import graft.operators.Reports
import graft.sources.Ingest

/** Property tests (SURVEY §5.3): frame-parse roundtrip, date-window
  * arithmetic, top-N containment in the grouped counts. Generators are
  * sampled with a fixed seed (deterministic CI).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("syslog frame roundtrip: any colon-space-free payload survives") {
    val gen = for {
      p <- Gen.choose(0, 999)
      body <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    } yield (p, body)
    val cases = samples(gen, 25)
    assert(cases.nonEmpty)
    val framed = cases.map { case (p, body) => s"<$p>host nginx: $body" }
      .toDF("value")
    val got = Ingest.parseFrame(framed).select("__payload").as[String]
      .collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("date window: width and bounds (core.py:66-72)") {
    val gen = for {
      epochDay <- Gen.choose(0L, 20000L)
      n <- Gen.choose(1, 400)
    } yield (LocalDate.ofEpochDay(epochDay), n)
    for ((stop, n) <- samples(gen, 50)) {
      val (a, b) = Dates.window(stop, n)
      assert(b === stop)
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) === n - 1L)
      assert(!a.isAfter(b))
    }
    assert(Dates.window(LocalDate.parse("2020-03-05"), 7)._1
      === LocalDate.parse("2020-02-28"))
  }

  test("LSH dedup precision: every emitted edge truly meets the Jaccard bar") {
    // random corpora with planted duplicate runs: the star variant may
    // MISS pairs (banding recall) but must never emit a false one —
    // the exact-verify step guarantees precision by construction
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = samples(docGen, 40)
    val corpus = texts.zipWithIndex
      .flatMap { case (t, i) =>
        // plant exact duplicates for every third doc
        if (i % 3 == 0) Seq((i.toLong, t), (1000L + i, t)) else Seq((i.toLong, t))
      }
      .toDF("doc_id", "text")
    val edges = graft.operators.Dedup.minhashLshDedup(corpus, 3, 0.5).collect()
    assert(edges.nonEmpty)
    val exact = graft.operators.Dedup.ngramJaccard(corpus, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    edges.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(j >= 0.5, s"edge ($a,$b) below threshold: $j")
      assert(exact.contains((a, b)) || exact.contains((b, a)),
        s"edge ($a,$b) not in the exact all-pairs relation")
    }
  }

  test("funnel invariants: converted <= entered, cohort offsets non-negative") {
    val events =
      graft.core.Tables.read(spark, "/root/testdata/sf0.001", "events")
    val funnel = graft.operators.Cohorts
      .funnel(events, "user_id", "ts", "event_type", "view", "purchase")
      .collect()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      assert(r.getAs[Long]("converted") <= r.getAs[Long]("entered"), r.toString)
    }
    val retention = graft.operators.Cohorts
      .retention(events, "user_id", "ts").collect()
    assert(retention.nonEmpty)
    retention.foreach { r =>
      assert(r.getAs[Long]("day_offset") >= 0L, r.toString)
      assert(r.getAs[Long]("active") >= 1L, r.toString)
    }
  }

  test("top-N per day is contained in the grouped counts, <= n per day") {
    val events =
      graft.core.Tables.read(spark, "/root/testdata/sf0.001", "events")
    for (n <- Seq(1, 2, 7); asc <- Seq(true, false)) {
      val top = Reports.topNPerDay(events, "ts", "user_id", "event_type",
        distinct = true, ascending = asc, n = n)
      val all = Reports.dailyGroupCount(events, "ts", "user_id", "event_type",
        distinct = true, ascending = asc)
      assert(top.except(all).isEmpty, s"n=$n asc=$asc not a subset")
      val perDay = top.groupBy("d").count().select("count").as[Long].collect()
      assert(perDay.forall(_ <= n), s"n=$n asc=$asc exceeded")
    }
  }

  test("int8 quantization: values bounded, reconstruction within half a step") {
    val gen = Gen.listOfN(16, Gen.choose(-8.0f, 8.0f))
    val vecs = samples(gen, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getAs[collection.Seq[Long]]("qvec"))).toMap
    vecs.foreach { case (id, orig) =>
      val (scale, q) = got(id)
      assert(q.forall(x => x >= -127 && x <= 127), s"vec $id out of range")
      // dequantized value within half a quantization step of the input
      orig.zip(q).foreach { case (o, qi) =>
        assert(math.abs(qi * scale - o) <= scale / 2 + 1e-9,
          s"vec $id: $o -> $qi at scale $scale")
      }
    }
  }

  test("dedupLines is idempotent: a cleaned corpus re-cleans to itself") {
    val word = Gen.oneOf("home", "nav", "body", "footer", "promo", "x", "y")
    val lineGen = Gen.listOfN(3, word).map(_.mkString(" "))
    val docGen = Gen.listOfN(4, lineGen).map(_.mkString("\n"))
    val docs = samples(docGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val cleaned = graft.operators.Curation.dedupLines(docs, "doc_id", "text")
    // every surviving line is globally unique, so a second pass keeps all
    // (docs whose text collapsed to '' contribute one empty line, which
    // dedups across them — exclude them from the fixpoint check)
    val again = graft.operators.Curation.dedupLines(
      cleaned.filter($"cleaned" =!= "")
        .select($"doc_id", $"cleaned".as("text")), "doc_id", "text")
    assert(again.filter($"n_kept" =!= $"n_lines").count() === 0L)
    // token conservation: kept + dropped == total lines, per doc
    val c = cleaned.collect()
    assert(c.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines")))
  }

  test("c4LineFilter is idempotent: kept lines all re-pass the gate") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "y9", "7z")
    val ending = Gen.oneOf(".", "!", "?", "\\\"", "", " etc")
    val lineGen = for {
      ws <- Gen.choose(1, 5).flatMap(Gen.listOfN(_, word))
      e <- ending
    } yield ws.mkString(" ") + e
    val docGen = Gen.listOfN(5, lineGen).map(_.mkString("\n"))
    val docs = samples(docGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = graft.operators.Curation.c4LineFilter(docs)
    val again = graft.operators.Curation.c4LineFilter(
      once.select($"doc_id", $"cleaned".as("text")))
    // a line that passed the gate passes it again — the only delta is
    // docs that collapsed to '' (one empty line, dropped again)
    val onceKept = once.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    again.collect().foreach { r =>
      val id = r.getLong(0)
      if (onceKept(id) > 0)
        assert(r.getLong(2) === onceKept(id), s"doc $id lost lines on re-clean")
    }
  }

  test("cross-corpus LSH precision: every pair meets the bar in the exact relation") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = samples(docGen, 30)
    val corpus = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the dump: every third corpus doc verbatim, plus fresh docs
    val dump = texts.zipWithIndex.collect {
      case (t, i) if i % 3 == 0 => (5000L + i, t)
    }.toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .minhashLshAgainst(dump, corpus, 3, 0.5).collect()
    assert(pairs.nonEmpty)
    // exact relation over the union (all-pairs reference)
    val exact = graft.operators.Dedup.ngramJaccard(
        corpus.unionByName(dump), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < 5000L && b >= 5000L, s"pair ($a,$b) not cross-side")
      assert(j >= 0.5, s"pair ($a,$b) below threshold: $j")
      assert(exact.contains((a, b)) || exact.contains((b, a)),
        s"pair ($a,$b) not in the exact all-pairs relation")
    }
  }

  test("normalizeUrl is idempotent over generated messy URLs") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      host <- Gen.oneOf("Ex.COM", "a.b.org", "WWW.Site.NET")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/p", "/p/q/", "/p//")
      q <- Gen.oneOf("", "?q=1", "?utm_s=x", "?utm_s=x&q=1", "?q=1&utm_c=2")
      frag <- Gen.oneOf("", "#f", "#a/b?c")
    } yield s"$scheme://$host$port$path$q$frag"
    val urls = samples(gen, 60).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val once = urls.select($"id",
      graft.operators.Curation.normalizeUrl(col("url")).as("url"))
    val twice = once.select($"id",
      graft.operators.Curation.normalizeUrl(col("url")).as("n2"))
    val diff = once.join(twice, "id").filter($"url" =!= $"n2").collect()
    assert(diff.isEmpty, diff.mkString("; "))
  }

  test("packSequences conserves tokens and fills all but the last chunk") {
    val word = Gen.oneOf("a", "bb", "ccc", "dddd")
    val docGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    for (seqLen <- Seq(7L, 32L, 512L)) {
      val texts = samples(docGen, 50)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val packed = graft.operators.TextAnalysis.packSequences(docs, seqLen)
        .orderBy("seq_id").collect()
      val total = texts.map(_.split(" ", -1).length.toLong).sum
      assert(packed.map(_.getAs[Long]("n_tokens")).sum === total)
      // all but the last sequence hold exactly seqLen tokens
      packed.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("n_tokens") === seqLen, r.toString))
      // sequence ids are contiguous from 0
      assert(packed.map(_.getLong(0)).toSeq === packed.indices.map(_.toLong))
    }
  }

  test("HLL daily uniques stay within 5% of exact (the one un-oracled query)") {
    val sf = "/root/testdata/sf0.001"
    val approx = Queries.queries("o11_daily_unique_approx")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = Queries.queries("o11_daily_unique")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (d, ex) =>
      val ap = approx(d)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$d: approx $ap vs exact $ex")
    }
  }

  test("stratified sample is invariant to input partitioning") {
    val docs = (0 until 500).map(i => (i.toLong, s"lang${i % 5}"))
      .toDF("doc_id", "lang")
    def sample(parts: Int) =
      graft.operators.Sampling
        .stratified(docs.repartition(parts), "lang", "doc_id", 7)
        .select("doc_id", "lang", "sample_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val one = sample(1)
    assert(sample(8) === one && sample(32) === one)
    assert(one.size === 35)
  }

  test("BPE merges are invariant to input partitioning") {
    val docs = (0 until 300).map(i =>
      (i.toLong, s"alpha$i beta${i % 7} gamma${i % 3} beta${i % 7}"))
      .toDF("doc_id", "text")
    def merges(parts: Int) =
      graft.operators.Bpe.bpeMerges(docs.repartition(parts), 5)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val one = merges(1)
    assert(one.size === 5)
    assert(merges(8) === one && merges(32) === one)
  }

  test("exactSubstrDedup is invariant to input partitioning and conserves tokens") {
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = (0 until 120).map { i =>
      val body = s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e"
      (i.toLong, if (i % 4 == 0) s"$body $span" else body)
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      graft.operators.Dedup.exactSubstrDedup(docs.repartition(parts), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    val one = run(1)
    assert(run(8) === one && run(32) === one)
    // every doc emits; kept <= total; hosts of the span lost exactly
    // its 8 tokens, everyone else is untouched
    assert(one.size === 120)
    one.foreach { case (id, total, kept, cleaned) =>
      if (id % 4 == 0) assert(total - kept === 8L, s"doc $id: $cleaned")
      else assert(total === kept)
    }
  }

  test("triangle counts are invariant to edge-list partitioning") {
    val edges = (0 until 400).map(i =>
      (s"n${i % 37}", s"n${(i * 7 + 3) % 41}")).toDF("src", "dst")
    def counts(parts: Int) = {
      val r = graft.operators.Graphs.triangleCount(edges.repartition(parts))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val one = counts(1)
    assert(counts(8) === one && counts(32) === one)
    assert(one._1 > 0)
  }

  test("fitDims: never upscales, fits the box, preserves aspect within a floor step") {
    val dims = for {
      w <- Gen.chooseNum(1, 5000); h <- Gen.chooseNum(1, 5000)
      bw <- Gen.chooseNum(1, 512); bh <- Gen.chooseNum(1, 512)
    } yield (w, h, bw, bh)
    samples(dims, 500).foreach { case (w, h, bw, bh) =>
      val (dw, dh) = graft.operators.Multimodal.fitDims(w, h, bw, bh)
      assert(dw >= 1 && dh >= 1, s"($w,$h)->($dw,$dh) box ($bw,$bh)")
      assert(dw <= math.max(w, bw) && dh <= math.max(h, bh),
        s"upscaled: ($w,$h)->($dw,$dh) box ($bw,$bh)")
      if (w <= bw && h <= bh) assert((dw, dh) === ((w, h)))
      else {
        assert(dw <= bw && dh <= bh, s"($w,$h)->($dw,$dh) !fit ($bw,$bh)")
        // both dims floor from ONE shared scale s: dw = floor(w*s) and
        // dh = floor(h*s) (modulo the 1px floor), so the aspect ratio
        // distorts by at most one floor step on each axis
        val s = math.min(bw.toDouble / w, bh.toDouble / h)
        assert(dw === math.max(1, math.floor(w * s).toInt))
        assert(dh === math.max(1, math.floor(h * s).toInt))
      }
    }
  }

  test("bigramLmScore is invariant to input partitioning (exact-decimal sum)") {
    val docs = (0 until 120).map { i =>
      val ws = (0 until 6 + i % 9).map(k => s"w${(i * 7 + k * k) % 40}")
      (i.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      graft.operators.TextAnalysis.bigramLmScore(docs.repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val one = run(1)
    assert(one.size === 120)
    // a double-summed score would drift across partitionings; the
    // DECIMAL(38,18) quantize-then-sum makes it bit-identical
    assert(run(8) === one && run(32) === one)
  }

  test("knSmoothedLmScore is invariant to input partitioning (exact-decimal sum)") {
    val docs = (0 until 120).map { i =>
      val ws = (0 until 6 + i % 9).map(k => s"w${(i * 7 + k * k) % 40}")
      (i.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      graft.operators.TextAnalysis.knSmoothedLmScore(docs.repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val one = run(1)
    assert(one.size === 120)
    // same discipline as the add-one LM: the per-bigram KN term is a
    // fixed-shape double, the sum is exact decimal
    assert(run(8) === one && run(32) === one)
  }

  test("greedyPieces and simhashDedup are partitioning-invariant") {
    // the greedy segmenter's mapPartitions walk and the simhash star's
    // bucket aggregates must not depend on row placement: the vocab
    // selection, segmentation, and keeper edges are all deterministic
    // functions of the data alone
    val base = graft.core.Tables
      .read(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 150).select($"doc_id", $"text")
    def pieces(parts: Int) =
      graft.operators.TextAnalysis.greedyPieces(base.repartition(parts), 5)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val p1 = pieces(1)
    assert(p1.size === 150 && pieces(13) === p1)
    def star(parts: Int) =
      graft.operators.Dedup.simhashDedup(base.repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(star(13) === star(1))
  }

  test("audioFrames: fuzz-safe on arbitrary bytes, conserves samples") {
    import graft.operators.Multimodal
    // fuzz: random byte blobs — some RIFF/WAVE-prefixed so the chunk
    // walk actually engages — must never surface a task failure; junk
    // yields zero frames (the frame-table sentinel), never a throw
    val gen = for {
      n <- Gen.choose(0, 200)
      bytes <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
      riff <- Gen.oneOf(true, false)
    } yield if (riff) ("RIFF????WAVE".getBytes("US-ASCII") ++ bytes)
            else bytes.toArray
    val blobs = samples(gen, 40).zipWithIndex.map { case (b, i) =>
      Multimodal.MediaRow(i.toLong, "audio", b, 1) }.toDS()
    val fuzzFrames = Multimodal.audioFrames(blobs, 64).collect()
    assert(fuzzFrames.forall(_.n_samples > 0))
    // conservation on real fixtures: per media, frame sample counts
    // sum to the synthetic length 256 + id % 256, and every frame but
    // the last is exactly frameLen
    val docs = Seq(0L, 5L, 131L, 255L).toDF("doc_id")
    val real = Multimodal.audioFrames(Multimodal.syntheticWavs(docs), 64)
      .collect().groupBy(_.media_id)
    for ((id, fs) <- real) {
      val sorted = fs.sortBy(_.frame_id)
      assert(sorted.map(_.n_samples).sum === 256 + id % 256, id.toString)
      assert(sorted.init.forall(_.n_samples === 64L), id.toString)
      assert(sorted.map(_.frame_id).toSeq === sorted.indices.toSeq,
        id.toString)
    }
  }

  test("ppjoin equals brute-force Jaccard on random corpora (lossless prefix)") {
    import org.apache.spark.sql.functions.col
    // small vocab + short docs force heavy shingle collisions — the
    // adversarial regime for prefix filtering
    val word = Gen.oneOf("ax", "by", "cz", "dw", "ev", "fu")
    val doc = Gen.choose(3, 9).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.choose(5, 14).flatMap(n => Gen.listOfN(n, doc))
    for ((docsList, ci) <- samples(corpusGen, 6).zipWithIndex) {
      val df = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.4, 0.7)) {
        def pairs(r: org.apache.spark.sql.DataFrame) =
          r.select(col("doc_a"), col("doc_b")).as[(Long, Long)]
            .collect().toSet
        val exact = pairs(graft.operators.Dedup.ngramJaccard(df, 2, t))
        val pp = pairs(graft.operators.Dedup.ppjoin(df, 2, t))
        assert(pp === exact, s"case $ci threshold $t")
      }
    }
  }

  test("edit-distance pairs carry true distances and respect the block rule") {
    import org.apache.spark.sql.functions.col
    val charGen = Gen.oneOf('a', 'b', 'c')
    val strGen = Gen.choose(20, 60).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString)
    val corpusGen = Gen.choose(6, 12).flatMap(n => Gen.listOfN(n, strGen))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (docsList <- samples(corpusGen, 5)) {
      val byId = docsList.zipWithIndex
        .map { case (s, i) => i.toLong -> s }.toMap
      val df = byId.toSeq.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .editDistancePairs(df, maxDist = 8, bandWidth = 16, maxBlock = 64)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .as[(Long, Long, Int)].collect()
      // soundness: every emitted pair's dist is the TRUE levenshtein
      for ((a, b, dist) <- got) {
        assert(dist === lev(byId(a), byId(b)), s"pair ($a,$b)")
        assert(dist <= 8)
        assert(a < b)
      }
      // completeness within the block rule: any pair with dist <= 8,
      // same first char, and |band diff| <= 1 must be emitted
      val gotSet = got.map(p => (p._1, p._2)).toSet
      for (a <- byId.keys; b <- byId.keys if a < b) {
        val (sa, sb) = (byId(a), byId(b))
        val sameBlock = sa.head == sb.head &&
          math.abs(sa.length / 16 - sb.length / 16) <= 1
        if (sameBlock && lev(sa, sb) <= 8)
          assert(gotSet.contains((a, b)), s"missing ($a,$b)")
      }
    }
  }

  test("kCore and corenessHIndex match a sequential reference peel on random graphs") {
    import graft.operators.Graphs
    val gen = for {
      n <- Gen.choose(5, 14)
      edges <- Gen.listOfN(28, for {
        a <- Gen.choose(0, n); b <- Gen.choose(0, n)
      } yield (s"v$a", s"v$b"))
    } yield edges
    def degrees(es: Set[(String, String)]): Map[String, Long] =
      (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    samples(gen, 4).foreach { raw =>
      val und = raw.collect { case (a, b) if a != b =>
        if (a < b) (a, b) else (b, a) }.toSet
      def peel(k: Int): Map[String, Long] = {
        var cur = und
        var changed = true
        while (changed) {
          val keep = degrees(cur).filter(_._2 >= k).keySet
          val nxt = cur.filter(e => keep(e._1) && keep(e._2))
          changed = nxt != cur
          cur = nxt
        }
        degrees(cur).filter(_._2 >= k)
      }
      val df = raw.toDF("src", "dst")
      for (k <- Seq(2, 3)) {
        val got = Graphs.kCore(df, k).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === peel(k), s"k=$k edges=$und")
      }
      // coreness = largest k whose k-core contains the node; the
      // h-index refinement converges to it (15 rounds >> the depth
      // any 15-node graph needs)
      val ref = degrees(und).keys.map { nd =>
        nd -> (1 to 15).filter(k => peel(k).contains(nd)).lastOption
          .getOrElse(0).toLong
      }.toMap
      val hi = Graphs.corenessHIndex(df, 15).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hi === ref, s"edges=$und")
    }
  }
}
