package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Deterministic sampling for training-data curation. The reproducible
  * complement to [[graft.Queries]]'s hash-split filter: where that
  * draws a FRACTION, these draw a fixed-size, class-balanced subset.
  */
object Sampling {

  /** Stratified top-k: the `k` rows per stratum with the smallest
    * md5-derived rank — the class-balancing subsample a pipeline draws
    * (e.g. equal documents per language). Membership depends only on
    * the row id, so the sample is stable across runs, engines, and
    * cluster sizes; the id itself breaks the (astronomically unlikely)
    * hash ties so the rank order is total.
    *
    * Scale shape: one hash-partition shuffle on the stratum, and the
    * `row_number ≤ k` filter triggers WindowGroupLimit — each map task
    * pre-truncates its partition to k rows per stratum BEFORE the
    * shuffle, so a billion-row stratum moves only k·tasks rows, never
    * the stratum.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Temperature-scaled multilingual sampling — the mT5/UniMax mixing
    * pattern: draw languages proportionally to n_l^(1/τ) with τ = 2,
    * flattening the head so low-resource languages keep
    * representation instead of being drowned by the dominant one.
    * Quantized to INTEGER arithmetic end-to-end so the sample is
    * bit-reproducible, not merely statistically similar:
    * s_l = ⌊√n_l⌋ (IEEE-754 sqrt is correctly rounded, so the floor
    * is engine-deterministic for any BIGINT count), and the
    * per-language quota is
    * t_l = ((N · budgetPct) div 100) · s_l div Σ s_m — every step a
    * BIGINT op. Membership within a language is the same md5-rank
    * order every sampler here uses, so quotas compose with the other
    * samplers and with re-runs.
    *
    * Scale shape: the per-language count table is |languages| rows —
    * a one-row-per-key aggregate crossed with a 1-row total, both
    * broadcast back. The within-language rank uses the SAME
    * two-level bucket trick as [[deterministicShuffle]] (a plain
    * `row_number over (partition by lang)` would funnel each
    * language — billions of rows at corpus scale — through one
    * reducer): hash high-bits range-bucket each language
    * order-preservingly, per-(lang, bucket) counts cumulate into
    * start offsets over a |langs|·nBuckets-row table (bounded,
    * broadcast), and the global per-language rank is offset +
    * bucket-local row_number. Bit-identical to the one-reducer form.
    */
  def temperatureSample(df: DataFrame, langCol: String, idCol: String,
                        budgetPct: Int, nBuckets: Int = 4096): DataFrame = {
    val counts = df.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_l"))
      .withColumn("s_l", floor(sqrt(col("n_l").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("n_l")).as("n_total"),
      sum(col("s_l")).as("s_total"))
    val targets = counts.crossJoin(broadcast(tot))
      .withColumn("target_n",
        expr(s"((n_total * $budgetPct) div 100) * s_l div s_total"))
      .select(col(langCol), col("target_n"))
    langRanked(df, langCol, idCol, nBuckets)
      .join(broadcast(targets), Seq(langCol))
      .filter(col("sample_rank") <= col("target_n"))
      .select(col(idCol), col(langCol), col("sample_rank"), col("target_n"))
  }

  /** Global per-language md5-rank without a per-language single
    * reducer: hash high-bits range-bucket each language
    * order-preservingly, per-(lang, bucket) counts cumulate into start
    * offsets over a |langs|·nBuckets-row table (bounded, broadcast),
    * and the global rank is offset + bucket-local row_number —
    * bit-identical to `row_number over (partition by lang)` while every
    * sort stays bucket-local. Shared by [[temperatureSample]] and
    * [[unimaxSample]].
    */
  private def langRanked(df: DataFrame, langCol: String, idCol: String,
                         nBuckets: Int): DataFrame = {
    val width = (1L << 60) / nBuckets + 1
    val keyed = df.select(col(idCol), col(langCol))
      .withColumn("__skey", hash60(col(idCol).cast("string")))
      .withColumn("__bucket", expr(s"__skey div $width"))
    val offsets = keyed.groupBy(col(langCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.partitionBy(col(langCol))
          .orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val within = Window.partitionBy(col(langCol), col("__bucket"))
      .orderBy(col("__skey"), col(idCol))
    keyed.join(broadcast(offsets), Seq(langCol, "__bucket"))
      .withColumn("sample_rank",
        (col("__off") + row_number().over(within)).cast("long"))
      .drop("__skey", "__bucket", "__off")
  }

  /** UniMax multilingual mixing (Chung et al. 2023): instead of a
    * temperature, cap each language at `epochs` passes over its data
    * and water-fill the document budget across languages — smallest
    * capacity first, each language taking
    * `min(epochs·n_l, ⌊remaining budget / remaining languages⌋)`, the
    * leftover redistributing to the larger languages. The result is
    * UniMax's signature shape: tail languages get ALL their data (up
    * to the epoch cap, never more repetition than that), head
    * languages split what's left near-uniformly.
    *
    * Output is one row per SELECTED document with `n_copies` — the
    * number of times it appears in the mix (quota div n_l full epochs
    * for everyone, +1 for the docs whose md5-rank falls inside the
    * remainder) — so quota = Σ n_copies per language exactly, in pure
    * BIGINT arithmetic, bit-reproducible across engines.
    *
    * Scale shape: the allocation recurrence is inherently sequential
    * but runs over the per-language COUNT table — |languages| rows, a
    * bounded driver-side fold (ISO gives ~200 languages; the corpus
    * never leaves the cluster) whose result broadcasts back. Document
    * membership is the same two-level bucketed md5-rank as every
    * sampler here ([[langRanked]]) — no per-language single-reducer
    * window, no collect of anything row-scaled.
    */
  def unimaxSample(df: DataFrame, langCol: String, idCol: String,
                   budgetPct: Int, epochs: Int,
                   nBuckets: Int = 4096): DataFrame = {
    require(epochs >= 1 && budgetPct >= 1)
    // |languages|-row bounded collect: the water-filling recurrence is
    // sequential by definition; its input is the language histogram,
    // never the corpus
    val langCounts = df.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_l"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = langCounts.map(_._2).sum
    var bRem = total * budgetPct / 100
    var mRem = langCounts.length.toLong
    val quotas = langCounts
      .map { case (l, n) => (l, n, epochs.toLong * n) }
      .sortBy { case (l, _, cap) => (cap, l) }
      .map { case (l, n, cap) =>
        val quota = math.min(cap, bRem / mRem)
        bRem -= quota; mRem -= 1
        (l, n, quota)
      }
    val spark = df.sparkSession
    import spark.implicits._
    val targets = quotas.toSeq.toDF(langCol, "n_l", "quota")
    langRanked(df, langCol, idCol, nBuckets)
      .join(broadcast(targets), Seq(langCol))
      .withColumn("n_copies",
        expr("quota div n_l") +
          when(col("sample_rank") <= col("quota") % col("n_l"), 1L)
            .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col(idCol), col(langCol), col("sample_rank"),
        col("n_copies"), col("quota"))
  }

  /** Per-source rate sampling — the data-mixing knob (Pile/DoReMi
    * style): each source keeps a deterministic `rate_permille / 1000`
    * fraction of its documents, so the training mix hits target
    * proportions reproducibly. Membership depends only on the doc id
    * (stable across runs, engines, partitionings); the weights table
    * is per-source — tiny by construction — and broadcasts, so the
    * whole operator is a map-side filter at any corpus size.
    */
  def mixSources(docs: DataFrame, weights: DataFrame,
                 idCol: String = "doc_id",
                 sourceCol: String = "source"): DataFrame =
    docs.join(broadcast(weights), sourceCol)
      .filter(hash60(col(idCol).cast("string")) % 1000 <
        col("rate_permille"))
      .select(col(idCol), col(sourceCol), col("rate_permille"))

  /** DoReMi-style multiplicative domain reweighting (the fixed-point
    * shape of Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
    * Speeds Up Language Model Pretraining", with the proxy-model
    * excess loss replaced by the classic cheap surrogate: per-source
    * RARE-TOKEN MASS — a domain whose tokens the corpus has barely
    * seen is the underfit domain the mixture should upweight). The
    * loss signal is parts-per-million integers and the update runs
    * on the 10⁶ grid with floor division:
    * w₀(s) = 10⁶ div |S|;  wₜ₊₁(s) = (wₜ(s)·ppm(s)·10⁶) div Σ wₜ·ppm
    * — every product ≤ 10¹⁸ BY CONSTRUCTION (both factors ≤ 10⁶
    * after the ppm normalization), so the recurrence cannot overflow
    * at any corpus size; only the ppm cross-multiply itself carries
    * a bound (n_rare < 9.2·10¹², documented — shard the per-source
    * aggregate past that). A zero loss sum keeps the previous
    * weights. Exact integers end to end: any engine, partitioning,
    * or iteration order reproduces the weights bit-for-bit.
    *
    * Scale shape: one (token) vocabulary aggregate, one token-keyed
    * join back (both plain hash shuffles), one per-source aggregate;
    * the recurrence itself runs on the |S|-row histogram on the
    * driver (the [[unimaxSample]] discipline — |sources| is tiny by
    * construction, never the corpus).
    */
  def mixtureReweight(docs: DataFrame, rareMax: Long = 2,
                      iters: Int = 2): DataFrame = {
    require(iters >= 1, "at least one update round")
    val toks = docs.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val cf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
    val per = toks.join(cf, "tok")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cf") <= rareMax, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ppm", expr("(n_rare * 1000000) div n_tokens"))
    val rows = per.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val spark = docs.sparkSession
    import spark.implicits._
    val nS = rows.length.toLong
    val ppm = rows.map(_._4)
    var w = rows.map(_ => if (nS == 0) 0L else 1000000L / nS)
    val hist = scala.collection.mutable.ArrayBuffer(w.toSeq)
    for (_ <- 1 to iters) {
      val p = w.zip(ppm).map { case (a, b) => a * b }.sum
      w = if (p == 0L) w
      else w.zip(ppm).map { case (a, b) => a * b * 1000000L / p }
      hist += w.toSeq
    }
    val out = rows.zipWithIndex.map { case ((s, nt, nr, pp), i) =>
      (s, nt, nr, pp, hist.map(_(i)).toList)
    }.toSeq
    out.toDF("source", "n_tokens", "n_rare", "rare_ppm", "ws")
      .select(col("source") +: col("n_tokens") +: col("n_rare") +:
        col("rare_ppm") +:
        (0 to iters).map(t => col("ws").getItem(t).as(s"w_$t")): _*)
  }

  /** Deterministic global corpus shuffle — the "shuffle the training
    * data" step: a dense 1..N `shuffle_rank` in md5-derived key order,
    * reproducible across runs, engines, and partitionings (seed in,
    * same permutation out).
    *
    * A naive `row_number() OVER (ORDER BY key)` funnels the corpus
    * through ONE reducer; this is the two-level form instead (the
    * sequence-packing prefix-sum pattern): keys range-bucket by their
    * high bits (order-preserving by construction), per-bucket counts
    * produce bucket START OFFSETS via a cumulative window over the
    * BUCKET TABLE (`nBuckets` rows — bounded, broadcast back), and the
    * global rank is bucket offset + within-bucket `row_number`. Every
    * sort is bucket-local (expected corpus/`nBuckets` rows); scale
    * `nBuckets` with the corpus so buckets stay executor-sized.
    * Bit-identical to the single-reducer oracle form.
    */
  def deterministicShuffle(docs: DataFrame, seed: Long,
                           idCol: String = "doc_id",
                           nBuckets: Int = 4096): DataFrame = {
    val key = hash60(concat(col(idCol).cast("string"),
      lit(":"), lit(seed.toString)))
    // hash60 < 2^60; ceil-width so buckets stay monotone in the key
    val width = (1L << 60) / nBuckets + 1
    val keyed = docs.select(col(idCol), key.as("skey"))
      .withColumn("__bucket", expr(s"skey div $width"))
    val offsets = keyed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val within = Window.partitionBy(col("__bucket"))
      .orderBy(col("skey"), col(idCol))
    keyed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("shuffle_rank",
        (col("__off") + row_number().over(within)).cast("long"))
      .select(col(idCol), col("skey"), col("shuffle_rank"))
  }

  /** Deterministic train/val/test assignment: each document lands in a
    * split by a salted hash of its id modulo 1000 — `[0, testPermille)`
    * → test, `[testPermille, testPermille+valPermille)` → val, rest →
    * train. Hash-based (never random, never positional) so the split
    * is stable under corpus growth — a document keeps its split when
    * new data arrives, which is what keeps eval sets uncontaminated
    * across dataset versions. Pure map-side projection; the salt
    * namespaces this split from every other hash-derived decision
    * (shuffle keys, sampling) so splits stay independent of them.
    */
  def assignSplits(docs: DataFrame, valPermille: Int, testPermille: Int,
                   idCol: String = "doc_id",
                   salt: String = "split"): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille < 1000, "val+test must leave train room")
    val h = hash60(concat(lit(salt + ":"), col(idCol).cast("string"))) % 1000L
    docs.withColumn("split",
      when(h < testPermille.toLong, "test")
        .when(h < (testPermille + valPermille).toLong, "val")
        .otherwise("train"))
  }

  /** Split-balance audit: per (lang, split), document count and total
    * characters — the table that verifies the hash split didn't
    * starve a language's eval slice (small languages can lose their
    * test set entirely to hash variance; this is where you notice).
    * One hash aggregation over |langs|·3 output rows.
    */
  def splitAudit(docs: DataFrame, valPermille: Int,
                 testPermille: Int): DataFrame =
    assignSplits(docs, valPermille, testPermille)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"))

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir"): each row
    * draws u ∈ (0,1) and keeps key u^(1/w); the k largest keys are a
    * weighted sample. The draw is md5-derived (u = (hash60(id)+1)/2⁶⁰,
    * clamped off zero) so both engines regenerate identical keys, and
    * the rank key is the monotone ln-transform ln(u)/w (largest
    * u^(1/w) ⟺ largest ln(u)/w since w > 0) — one fewer transcendental
    * in the fixed IEEE tree. Ties break on doc_id.
    *
    * Scale shape: the key is a pure projection; the k survivors come
    * from orderBy+limit = TakeOrderedAndProject — the distributed
    * top-k, never a global sort. One pass, O(k) driver memory, exactly
    * the property the reservoir paper is about.
    */
  def weightedSample(df: DataFrame, idCol: String,
                     weight: org.apache.spark.sql.Column,
                     k: Int): DataFrame = {
    val u = greatest(
      (hash60(col(idCol).cast("string")) + 1L).cast("double") /
        lit(1152921504606846976.0), // 2^60
      lit(8.673617379884035e-19))
    df.withColumn("w", weight.cast("double"))
      .filter(col("w") > 0.0)
      .withColumn("es_key", log(u) / col("w"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }
}
