package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-curation operators beyond per-document filtering: structure-
  * aware dedup (lines), source canonicalization (URLs), distribution-
  * based selection (global percentile cutoff, hashed-n-gram importance
  * selection). These are the passes a web-scale training-data pipeline
  * runs between raw crawl and tokenization.
  *
  * Everything is built-in Catalyst surface (no UDFs): the per-row
  * stages are whole-stage-codegen'd projections, and the aggregation
  * stages shuffle narrow keys only.
  */
object Curation {

  /** CCNet-style line-level deduplication: split every document into
    * lines, drop every line whose exact content (md5) has already been
    * seen at a smaller (doc_id, position) anywhere in the corpus, and
    * reassemble the surviving lines in order. Boilerplate (headers,
    * nav bars, cookie banners) repeats across pages line-for-line even
    * when whole documents differ, which is why line-granular dedup
    * removes what document-granular dedup cannot.
    *
    * Output: one row per input document — `n_lines`, `n_kept`, and the
    * reassembled `cleaned` text ('' when every line was a repeat).
    *
    * Scale shape: one posexplode (no arrays survive it — rows are
    * (doc_id, pos, line)), ONE shuffle on the line hash for the
    * first-occurrence rank, one shuffle back on doc_id for ordered
    * reassembly, then a doc_id-keyed left join against the per-doc
    * line counts (so docs whose every line was a repeat still emit a
    * row with `cleaned = ''`). The first-occurrence window partitions
    * by md5(line) — at 100 TB the hottest key is a hot *line* (an
    * empty line, "Home"), whose bucket is bounded by rank-1 early
    * exit: because the `rn = 1` filter sits directly on the window,
    * WindowGroupLimit truncates each map task to one row per hash
    * BEFORE the shuffle, so a billion-occurrence line ships one row
    * per task, not a billion. (A single-pass conditional aggregate
    * would save the second scan but lose exactly that truncation —
    * every hot-line occurrence would cross the wire to one reducer.)
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .as(Seq("pos", "line")))
    val firstSeen = Window.partitionBy(md5(col("line")))
      .orderBy(col("doc_id"), col("pos"))
    val kept = lines
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, expr(
          "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"))
          .as("cleaned"))
    df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Corpus-frequency content score — the EXACT-arithmetic stand-in
    * for CCNet's LM-perplexity bucketing (Wenzek et al. 2020 splits a
    * corpus into head/middle/tail by language-model perplexity; with
    * no external LM in scope, mean corpus-wide bigram frequency is
    * the deterministic analog: high = common/templated content, low =
    * rare/unusual): per document, the count and corpus-frequency sum
    * of its word n-grams, with the mean as an exact
    * bigint-over-bigint double. Feed the score to [[qualityCutoff]]'s
    * quantile pattern for the actual head/middle/tail split.
    *
    * Shape: one corpus-wide gram count (partial+final hash agg) and
    * one gram-keyed join back to the per-doc gram stream. The gram
    * explode is codegen over the scan and is recomputed per subtree —
    * deliberately NOT localCheckpoint-pinned, because materializing a
    * corpus-scale gram stream costs more than re-running the explode.
    * The counts side aggregates BEFORE joining, so it broadcasts when
    * the vocabulary fits (tiny SF) and shuffle-joins otherwise; the
    * raw gram side is never sorted or collected.
    */
  def ngramFrequencyScore(docs: DataFrame, n: Int = 2): DataFrame = {
    val grams = graft.operators.Dedup.shingleRows(docs, n, distinct = false)
    val counts = grams.groupBy(col("shingle")).agg(count(lit(1)).as("cf"))
    grams.join(counts, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("cf")).as("sum_cf"))
      .withColumn("mean_cf",
        col("sum_cf").cast("double") / col("n_grams").cast("double"))
  }

  /** C4-style line-level cleanup (Raffel et al. 2020, §2.2): keep only
    * lines that end in terminal punctuation (`.` `!` `?` `"`) AND have
    * at least `minWords` words; reassemble the survivors in order.
    * Unlike [[dedupLines]] (which needs a corpus-wide first-seen
    * shuffle), this is a PURE PROJECTION — the line split, per-line
    * predicate, and rejoin all happen inside one row via higher-order
    * array functions, so it costs a map pass at any corpus size.
    * Emits per-doc line accounting so the gate's aggressiveness is
    * observable.
    */
  def c4LineFilter(df: DataFrame, minWords: Int = 3): DataFrame = {
    val lines = split(col("text"), "\n", -1)
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") && size(split(l, " ", -1)) >= minWords)
    df.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("cleaned"))
  }

  /** Per-SOURCE boilerplate stripping (the RefinedWeb / trafilatura
    * content-extraction pass): a line that recurs across a large
    * fraction of a source's documents is template chrome (nav bars,
    * cookie banners, footers), not content — strip every occurrence
    * and keep lines unique to their page. Unlike [[dedupLines]]
    * (first occurrence survives GLOBALLY), boilerplate is judged
    * per source and removes ALL occurrences, including the first:
    * the template itself carries no training signal.
    *
    * A line is boilerplate within source `s` iff it occurs in at
    * least `minDocs` distinct documents of `s` AND in at least
    * `fracNum/fracDen` of them — the threshold compare is an integer
    * cross-multiply (`n_with * fracDen >= fracNum * n_src_docs`), so
    * both engines agree bit-exactly with no float boundary.
    *
    * Output: one row per document — `n_lines`, `n_boiler` (occurrences
    * stripped), `n_chars_kept` (separator-free), and the reassembled
    * `cleaned` text.
    *
    * Scale shape: one posexplode; the per-(source, line-hash) distinct
    * doc count is two hash aggregations (the distinct's partials
    * collapse within-doc repeats map-side); the per-source doc count
    * is a |sources|-row aggregate joined in broadcast. The flagged
    * set is filtered BEFORE joining back — only boilerplate hashes
    * (bounded by template vocabulary, not corpus size) cross the
    * wire, and the join back to the line stream is a hash join on
    * (source, hash). The reassembly is the same ordered collect_list
    * as [[dedupLines]], one doc_id shuffle.
    */
  def boilerplateStrip(df: DataFrame, idCol: String, srcCol: String,
                       textCol: String, fracNum: Int = 1, fracDen: Int = 2,
                       minDocs: Int = 2, sep: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    val lines = df
      .select(col(idCol).as("doc_id"), col(srcCol).as("src"),
        posexplode(split(col(textCol), q, -1)).as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    val lineDocs = lines.select(col("src"), col("h"), col("doc_id"))
      .distinct()
      .groupBy(col("src"), col("h"))
      .agg(count(lit(1)).as("n_with"))
    val srcDocs = df.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_src_docs"))
    val boiler = lineDocs
      .join(broadcast(srcDocs), "src")
      .filter(col("n_with") >= minDocs &&
        col("n_with") * fracDen >= lit(fracNum.toLong) * col("n_src_docs"))
      .select(col("src"), col("h"), lit(true).as("is_boiler"))
    lines
      .join(boiler, Seq("src", "h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
        sum(when(col("is_boiler").isNull, length(col("line")))
          .otherwise(0L)).cast("long").as("n_chars_kept"),
        concat_ws(sep, expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN is_boiler IS NULL THEN struct(pos, line) END)), " +
            "x -> x.line)")).as("cleaned"))
  }

  /** Per-source corpus audit: the table a curation run publishes
    * before deciding which sources to keep, downweight, or drop
    * (C4 and Gopher both gate at domain granularity). Per source:
    * document count, exact-duplicate count (docs minus distinct
    * texts — the within-source redundancy that inflates a source's
    * apparent size), distinct languages, total and mean characters.
    * One hash aggregation over (source, text-hash) partials then a
    * |sources|-row rollup — never corpus-scale state.
    */
  def sourceAudit(docs: DataFrame): DataFrame = {
    docs
      .select(col("source"), md5(col("text")).as("h"), col("lang"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique_texts"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") /
          count(lit(1)).cast("double")).as("mean_chars"))
  }

  /** URL canonicalization: lowercase scheme and host, strip default
    * ports (:80/:443), drop the fragment, strip tracking (utm_*) query
    * parameters, and collapse trailing slashes — so crawl variants of
    * the same page agree on one key. Pure staged regex projection
    * (ASCII classes, no backreferences), identical under Java regex
    * and RE2.
    */
  def normalizeUrl(url: Column): Column = {
    val u0 = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      ":(443|80)$", "")
    val path = regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u0, "\\?([^#]*)", 1)
    val qClean = regexp_replace(
      regexp_replace(concat(lit("&"), query), "&utm_[A-Za-z0-9_]+=[^&]*", ""),
      "^&", "")
    val pTrim = regexp_replace(path, "/+$", "")
    val nPath = when(path === "" || pTrim === "", "/").otherwise(pTrim)
    concat(scheme, lit("://"), host, nPath,
      when(qClean === "", "").otherwise(concat(lit("?"), qClean)))
  }

  /** Canonical-URL dedup: normalize, then one count per canonical URL
    * with the smallest id as the keeper — the crawl-frontier dedup
    * that runs before any content is even fetched twice. One narrow
    * hash-shuffle on the normalized string; map-side partials collapse
    * the per-split repeats first.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("norm_url"))
      .groupBy(col("norm_url"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("canonical_id"))

  /** Distribution-based quality gate: keep documents whose type-token
    * ratio reaches the corpus-wide `p`-quantile — a *relative* cutoff
    * that adapts to the corpus instead of a hand-tuned constant
    * (the "remove the worst X%" knob every curation pipeline has).
    *
    * The cutoff is a one-row aggregate cross-joined back (broadcast —
    * never a driver collect). `exact = true` (default) uses exact
    * `percentile`, which sort-aggregates the score column on one
    * reducer: fine into the tens of millions of docs, and the
    * bit-exact form the oracle can check. `exact = false` is the
    * 100 TB tier: `approx_percentile` (mergeable partial sketches, no
    * single-reducer sort) with an epsilon on the boundary — the plan
    * is identical otherwise, so the two tiers differ only in which
    * docs within ±accuracy-quantile of the cutoff flip sides.
    */
  def qualityCutoff(docs: DataFrame, p: Double,
                    exact: Boolean = true,
                    accuracy: Int = 10000): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(col("doc_id"),
      (size(array_distinct(toks)).cast("double") /
        size(toks).cast("double")).as("ttr"))
    val cutExpr =
      if (exact) expr(s"percentile(ttr, $p)")
      else expr(s"approx_percentile(ttr, $p, $accuracy)")
    val cut = scored.agg(cutExpr.as("cutoff"))
    scored.crossJoin(broadcast(cut))
      .filter(col("ttr") >= col("cutoff"))
      .select(col("doc_id"), col("ttr"), col("cutoff"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): documents are
    * scored by how much their hashed-bigram distribution leans toward
    * a target slice of the corpus (here: a predicate like
    * `lang = 'en'`), against the raw corpus distribution.
    *
    * Bigrams hash into `buckets` feature buckets; a bucket is
    * target-leaning iff its target share exceeds the corpus-wide
    * target share — compared by INTEGER cross-multiplication
    * (`c_t·N_r > c_r·N_t`), so both engines agree bit-for-bit with no
    * log-ratio float summation (the paper's log-likelihood-ratio sum
    * is order-sensitive in floats; the leaning-bucket vote is the
    * order-independent form of the same signal). A document is
    * `selected` when its own leaning-gram share beats the corpus
    * target share — again integer cross-multiplied.
    *
    * Scale shape: one bigram explode; the bucket table is `buckets`
    * rows (map-side partials collapse the explode immediately) and
    * broadcasts back; totals are a 1-row aggregate; the only wide
    * shuffle is the per-doc count. Nothing is quadratic and no
    * floating-point accumulates across partitions. At 100 TB the
    * integer cross-products approach Long overflow (c·N ≲ 9.2e18), so
    * promote the comparison to DECIMAL(38,0) there — same plan.
    */
  def dsirSelect(docs: DataFrame, targetPred: Column,
                 buckets: Int = 1024): DataFrame = {
    val w = tokens(col("text"))
    val grams = docs
      .select(col("doc_id"), targetPred.as("is_t"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("is_t"),
        explode(sequence(lit(0), size(col("w")) - 2)).as("i"),
        col("w"))
      .select(col("doc_id"), col("is_t"),
        (hash60(concat_ws(" ",
          element_at(col("w"), col("i") + 1),
          element_at(col("w"), col("i") + 2))) % buckets).as("b"))
    val bucketCounts = grams.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
        count(lit(1)).as("c_r"))
    val totals = bucketCounts
      .agg(sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"))
    val leaning = bucketCounts.crossJoin(broadcast(totals))
      .select(col("b"),
        (col("c_t") * col("n_r") > col("c_r") * col("n_t")).as("leaning"),
        col("n_t"), col("n_r"))
    grams.join(broadcast(leaning), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("leaning"), 1L).otherwise(0L)).as("n_target"),
        first(col("n_t")).as("n_t"), first(col("n_r")).as("n_r"))
      .select(col("doc_id"), col("n_grams"), col("n_target"),
        (col("n_target").cast("double") / col("n_grams").cast("double"))
          .as("target_frac"),
        (col("n_target") * col("n_r") > col("n_grams") * col("n_t"))
          .as("selected"))
  }

  /** Weak-supervision quality classifier, train step: a multinomial
    * Naive Bayes model over hashed token features (the fastText-style
    * distillation every large curation stack runs — CCNet's LM filter,
    * Llama's "quality classifier" — here trained IN-ENGINE on weak
    * labels from the Gopher rule battery rather than on a shipped
    * model). Per hash bucket, token occurrences under pass/fail labels
    * are counted, and the bucket's `vote` is the SIGN of its
    * Laplace-smoothed log-odds — computed as a cross-multiplied
    * integer comparison (`(n_pos+1)·(t_neg+D) ⋛ (n_neg+1)·(t_pos+D)`,
    * in DECIMAL(38,0) so corpus-scale token counts cannot overflow),
    * so no float log enters the model and both engines agree
    * bit-for-bit.
    *
    * The weak label is any boolean Column over the document row
    * (default: the full Gopher battery; the declared queries use the
    * word-count band so the synthetic corpus trains both classes).
    *
    * Scale shape: ONE pass — the label is evaluated inline in
    * the same projection that explodes tokens (no doc-keyed label
    * join), then one hash aggregation whose key space is `dims`. The
    * finished model is a dims-row table; the totals ride a 1-row
    * aggregate crossJoin. No iteration, no driver state, no collect.
    */
  def nbQualityModel(docs: DataFrame, dims: Int,
                     label: Column = TextAnalysis.gopherVerdict): DataFrame = {
    require(dims > 0 && dims <= 65536, "model must stay broadcast-sized")
    val labeled = docs.select(
        label.as("verdict"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("verdict"),
        pmod(hash60(col("tok")), lit(dims.toLong)).as("dim"))
    val counts = labeled.groupBy(col("dim"))
      .agg(sum(when(col("verdict"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("verdict"), 0L).otherwise(1L)).as("n_neg"))
    val totals = counts.agg(
      sum(col("n_pos")).as("t_pos"), sum(col("n_neg")).as("t_neg"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val lhs = dec(col("n_pos") + 1L) * dec(col("t_neg") + dims.toLong)
    val rhs = dec(col("n_neg") + 1L) * dec(col("t_pos") + dims.toLong)
    counts.crossJoin(broadcast(totals))
      .select(col("dim"), col("n_pos"), col("n_neg"),
        when(lhs > rhs, 1L).when(lhs < rhs, -1L).otherwise(0L).as("vote"))
  }

  /** Weak-supervision quality classifier, score step: every document's
    * score is the sum of its tokens' bucket votes under the
    * [[nbQualityModel]] trained on the same corpus — the binarized-NB
    * decision rule. `predicted_keep = score > 0` is the distilled
    * gate: unlike the rule battery it generalizes (a doc full of
    * pass-leaning vocabulary scores positive even where a single hard
    * rule would kill it), which is exactly the role the shipped
    * fastText classifiers play in public pipelines.
    *
    * Scale shape: the model is a dims-row broadcast; scoring is one
    * token explode joined map-side against it and one doc-keyed sum.
    * Two corpus scans total (train + score), both shuffle-light.
    */
  def nbQualityScore(docs: DataFrame, dims: Int,
                     label: Column = TextAnalysis.gopherVerdict): DataFrame = {
    val model = nbQualityModel(docs, dims, label)
      .select(col("dim"), col("vote"))
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(hash60(col("tok")), lit(dims.toLong)).as("dim"))
      .join(broadcast(model), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(sum(col("vote")).as("score"), count(lit(1)).as("n_tok"))
      .select(col("doc_id"), col("score"), col("n_tok"),
        (col("score") > 0L).as("predicted_keep"))
  }

  /** Classifier-vs-labeler confusion matrix: how the distilled NB gate
    * ([[nbQualityScore]]) disagrees with the Gopher weak labels that
    * trained it — the 4-row audit table a curation run publishes
    * before swapping a rule gate for a learned one. A heavy
    * false-keep row means the classifier is letting rule-rejected
    * vocabulary through; at 100 TB this table is the whole decision.
    */
  def nbConfusion(docs: DataFrame, dims: Int,
                  label: Column = TextAnalysis.gopherVerdict): DataFrame =
    docs.select(col("doc_id"), label.as("label_keep"))
      .join(nbQualityScore(docs, dims, label)
        .select(col("doc_id"), col("predicted_keep")), "doc_id")
      .groupBy(col("label_keep"), col("predicted_keep"))
      .agg(count(lit(1)).as("n_docs"))

  /** Classifier calibration table (the reliability diagram behind an
    * expected-calibration-error readout, Guo et al. 2017): bucket each
    * document's NB confidence into `bins` equal-width bins and emit,
    * per bin, the document count, the weak-label keep count, the
    * predicted-keep count, and the count where prediction and label
    * agree. A well-calibrated gate has label-keep fraction tracking
    * the bin midpoint; a cliff at the extremes means the vote-sum
    * score is overconfident and the keep threshold needs a margin.
    *
    * The confidence proxy is the positive-vote token fraction
    * `(score + n_tok) / (2·n_tok)` in [0,1]; the bin index is the
    * all-integer `min((score + n_tok)·bins div (2·n_tok), bins-1)`
    * so both engines bin identically with no float boundary.
    * Scale shape: [[nbQualityScore]]'s two shuffle-light scans plus
    * one `bins`-row hash aggregation.
    */
  def nbCalibration(docs: DataFrame, dims: Int, bins: Int,
                    label: Column = TextAnalysis.gopherVerdict): DataFrame = {
    require(bins > 0, "bins must be positive")
    val scored = nbQualityScore(docs, dims, label)
    val conf = docs.select(col("doc_id"), label.as("label_keep"))
      .join(scored, "doc_id")
      .withColumn("bin", least(
        expr(s"((score + n_tok) * cast($bins as bigint)) div (n_tok * 2)"),
        lit(bins.toLong - 1L)))
    conf.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label_keep"), 1L).otherwise(0L)).as("n_label_keep"),
        sum(when(col("predicted_keep"), 1L).otherwise(0L)).as("n_pred_keep"),
        sum(when(col("label_keep") === col("predicted_keep"), 1L)
          .otherwise(0L)).as("n_correct"))
  }

  /** EXACT ROC-AUC of the NB gate's vote-sum score against its weak
    * labels — the threshold-free ranking audit that complements
    * [[nbConfusion]] (which grades one cutpoint) and
    * [[nbCalibration]] (which grades the probabilities): the Mann–
    * Whitney identity AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
    * computed over SCORE GROUPS, all in integers — `num2` is twice
    * the concordant-pair count plus the tied-pair count, so both
    * engines agree bit-for-bit and the only float op is the final
    * division.
    *
    * Scale shape: rides [[nbQualityScore]]'s two shuffle-light scans;
    * the pair counting needs NO pairwise join — one hash aggregate
    * keyed on the score plus one cumulative window over the ≤
    * |distinct vote sums| score groups (a provably tiny relation:
    * votes are −1/0/+1 per token, so groups are bounded by the token-
    * count range, and the corpus never enters the window).
    */
  def nbAuc(docs: DataFrame, dims: Int,
            label: Column = TextAnalysis.gopherVerdict): DataFrame =
    nbAucFrom(docs, nbQualityScore(docs, dims, label), label)

  /** The Mann–Whitney pair counting of [[nbAuc]] over any scored
    * relation (doc_id, score) — shared by the scan-time and standing
    * forms so the audit arithmetic exists once.
    */
  private def nbAucFrom(docs: DataFrame, scoredIn: DataFrame,
                        label: Column): DataFrame = {
    val scored = scoredIn.select(col("doc_id"), col("score"))
    val grp = docs.select(col("doc_id"), label.as("label_keep"))
      .join(scored, "doc_id")
      .groupBy(col("score"))
      .agg(sum(when(col("label_keep"), 1L).otherwise(0L)).as("p"),
        sum(when(col("label_keep"), 0L).otherwise(1L)).as("n"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grp.withColumn("cum_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cum_n") + col("n"))).as("num2"))
      .select(col("n_pos"), col("n_neg"), col("num2"),
        (col("num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  /** Materialize the NB quality MODEL at rest — the
    * [[graft.operators.TextAnalysis.knModelWrite]] standing-layout
    * pattern applied to the classifier tier: the dims-row vote table
    * [[nbQualityModel]] re-trains per query (one full token-explode
    * shuffle — the dominant cost of every nb_* query per
    * SCALING_r16) is written once per corpus version, keyed by the
    * docs fingerprint. Layout: `$path/votes` (dim, n_pos, n_neg,
    * vote), `$path/meta` (built_n, sig, dims) — meta written LAST,
    * the completeness marker; `dims` is stamped so scoring hashes
    * tokens into exactly the bucket space the model trained in. The
    * label column is part of the model's identity but not its
    * fingerprint — callers key the path by label choice (the
    * config-tagged-path rule every at-rest layout follows).
    */
  def nbModelWrite(docs: DataFrame, dims: Int, path: String,
                   label: Column = TextAnalysis.gopherVerdict): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaP)) { fs.delete(metaP, true); () }
    nbQualityModel(docs, dims, label)
      .write.mode("overwrite").parquet(s"$path/votes")
    val (n, sig) = TextAnalysis.docsFingerprint(docs)
    Seq((n, sig, dims)).toDF("built_n", "sig", "dims")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** True when a complete [[nbModelWrite]] layout at `path` matches
    * `docs`' fingerprint AND was trained at `dims` buckets.
    */
  def nbModelFresh(spark: org.apache.spark.sql.SparkSession,
                   path: String, docs: DataFrame, dims: Int): Boolean = {
    val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
    if (!metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(metaP)) return false
    val m = spark.read.parquet(s"$path/meta")
      .select(col("built_n"), col("sig"), col("dims")).head
    m.getInt(2) == dims &&
      (m.getLong(0), m.getLong(1)) == TextAnalysis.docsFingerprint(docs)
  }

  /** [[nbQualityScore]] against a STANDING [[nbModelWrite]] model:
    * one corpus scan (the score explode) instead of two — the train
    * scan ran when the model was built. Bucket count comes from the
    * layout's own meta so scoring can never hash into a different
    * space than the stored votes. Bit-identical to the scan-time
    * score by construction (the stored votes ARE the trained model).
    */
  def nbQualityScoreAtRest(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    val dims = spark.read.parquet(s"$path/meta")
      .select(col("dims")).head.getInt(0)
    val model = spark.read.parquet(s"$path/votes")
      .select(col("dim"), col("vote"))
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(hash60(col("tok")), lit(dims.toLong)).as("dim"))
      .join(broadcast(model), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(sum(col("vote")).as("score"), count(lit(1)).as("n_tok"))
      .select(col("doc_id"), col("score"), col("n_tok"),
        (col("score") > 0L).as("predicted_keep"))
  }

  /** [[nbQualityScoreAtRest]] with the build-if-stale convenience —
    * what the declared queries run: the training shuffle happens once
    * per corpus version, every later pass scores against the standing
    * vote table. Same result, same oracle.
    */
  def nbQualityScoreStanding(docs: DataFrame, dims: Int, path: String,
      label: Column = TextAnalysis.gopherVerdict): DataFrame = {
    val spark = docs.sparkSession
    if (!nbModelFresh(spark, path, docs, dims))
      nbModelWrite(docs, dims, path, label)
    nbQualityScoreAtRest(docs, path)
  }

  /** [[nbAuc]] over the standing model — the ranking audit's pair
    * counting unchanged, the scores resolved from
    * [[nbQualityScoreStanding]].
    */
  def nbAucStanding(docs: DataFrame, dims: Int, path: String,
      label: Column = TextAnalysis.gopherVerdict): DataFrame =
    nbAucFrom(docs, nbQualityScoreStanding(docs, dims, path, label), label)

  /** k-anonymity audit over quasi-identifiers (Sweeney 2002): group
    * the corpus into equivalence classes on (lang, source,
    * ⌊n_chars/band⌋) — the released-metadata columns an attacker could
    * link on — and flag every class smaller than `k`. A row in a
    * `risky` class is re-identifiable to within class_size candidates;
    * the publish step either suppresses those rows or coarsens the
    * bands until the audit is clean. This is the privacy gate that
    * pairs with the PII text scrub: the scrub removes identifiers
    * INSIDE documents, this audit bounds what the metadata itself
    * leaks.
    *
    * Scale shape: one hash aggregation keyed on the quasi-identifier
    * tuple (map-side partials collapse everything; the output is
    * |classes| rows, bounded by the identifier-domain product, not the
    * corpus). Nothing else — the cheapest pass in the pipeline.
    */
  def kAnonymityAudit(docs: DataFrame, k: Int, band: Int): DataFrame = {
    require(k > 0 && band > 0)
    docs.select(col("lang"), col("source"),
        // floor division, matching the oracle's `n_chars//band`
        // unconditionally (a bare double-divide-then-cast truncates
        // toward zero, diverging on negative inputs)
        floor(col("n_chars").cast("long") / lit(band)).cast("long")
          .as("len_band"))
      .groupBy(col("lang"), col("source"), col("len_band"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("risky", col("class_size") < k)
  }

  /** Pairwise language vocabulary overlap: for every unordered pair of
    * languages WITH A NONZERO INTERSECTION (the inner self-join emits
    * nothing for disjoint vocabularies — callers wanting inter=0 rows
    * left-join this against a language cross product), the
    * intersection size of their distinct-term
    * vocabularies plus each side's vocabulary size — the corpus-
    * similarity table behind multilingual mixing decisions (two
    * languages whose vocabularies barely intersect share little
    * transfer; a near-total overlap flags mislabeled language IDs).
    * All three numbers are exact BIGINTs; Jaccard is the caller's one
    * division, kept out of the engine so the comparison stays
    * integer-exact.
    *
    * Scale shape: one (lang, term) distinct (map-side partials), a
    * term-keyed self-join whose output is bounded by
    * |vocabulary|·|langs|² — vocabulary-scaled, never corpus-scaled —
    * and a |langs|²-row aggregate joined against the |langs|-row size
    * table (broadcast).
    */
  def langVocabOverlap(docs: DataFrame): DataFrame = {
    val v = docs
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val sizes = v.groupBy(col("lang")).agg(count(lit(1)).as("v_size"))
    v.as("a").join(v.as("b"),
        col("a.term") === col("b.term") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.withColumnRenamed("lang", "lang_a")
        .withColumnRenamed("v_size", "size_a")), "lang_a")
      .join(broadcast(sizes.withColumnRenamed("lang", "lang_b")
        .withColumnRenamed("v_size", "size_b")), "lang_b")
      .select(col("lang_a"), col("lang_b"), col("inter"),
        col("size_a"), col("size_b"))
  }

  /** Differentially-private-mechanism noisy histogram (Dwork et al.
    * 2006 Laplace mechanism, SEEDED): per-language document counts
    * with additive Laplace(1/ε) noise whose uniform draw comes from
    * the md5 of the class key instead of a real RNG. The seeding makes
    * the release bit-reproducible (and oracle-checkable) — which is
    * exactly what a REAL ε-DP release must never do: a deployment
    * replaces [[graft.functions.TextFunctions.hash60]] with a secure
    * random source and keeps everything else. This operator documents
    * the mechanism's dataflow (exact counts never leave the engine —
    * only the noised column does) rather than claiming a privacy
    * guarantee.
    *
    * Noise derivation: u = max(hash60("dp:"+lang)/2⁶⁰, 2⁻⁶⁰) ∈ (0,1)
    * (the clamp keeps the 2⁻⁶⁰-probability hash60=0 draw from landing
    * ln(0) = −∞ in noisy_n), then the
    * Laplace inverse CDF −sign(u−½)·ln(1−2·|u−½|)/ε — a fixed tree of
    * IEEE double ops mirrored in the oracle, ≤1 ulp wobble in ln
    * absorbed by the gate's 6-decimal rounding.
    *
    * Scale shape: one |langs|-row hash aggregation; the noise is a
    * per-group projection. Nothing else.
    */
  def dpCounts(docs: DataFrame, epsilon: Double): DataFrame = {
    require(epsilon > 0.0)
    val u = greatest(
      hash60(concat(lit("dp:"), col("lang"))).cast("double") /
        lit(1152921504606846976.0), // 2^60
      lit(8.673617379884035e-19))   // 2^-60: keep u > 0 so ln stays finite
    val half = u - lit(0.5)
    val noise = (-signum(half)) * log(lit(1.0) - lit(2.0) * abs(half)) /
      lit(epsilon)
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("noisy_n", col("n_docs") + noise)
  }

  /** Per-source token-distribution drift: KL(P_source ‖ P_corpus) for
    * every source — the audit that flags a crawl snapshot or domain
    * whose vocabulary usage diverges from the corpus it is about to be
    * mixed into (the distribution-shift counterpart of
    * [[Sampling]]'s mixing weights). Every source token is by
    * definition in the corpus, so no zero-denominator smoothing is
    * needed and the sum is exact:
    * KL = Σ_t (c_st/N_s)·ln((c_st/N_s)/(c_t/N)).
    *
    * Scale shape: one (source, token) hash aggregate, one token hash
    * aggregate, a shuffle equi-join on the token key (vocabulary scale,
    * NOT corpus scale — at web scale the global token table is the
    * small side and broadcasts), and a |sources|-row rollup. The
    * per-source and global totals ride along as window-free rollup
    * joins on tiny keys.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(tokens(col("text"))).as("t"))
    val st = tok.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c_st"))
    val gt = tok.groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = broadcast(gt.agg(sum(col("c_t")).as("n")))
    st.join(broadcast(gt), "t")
      .join(broadcast(ns), "source")
      .crossJoin(n)
      .select(col("source"), col("n_s"),
        (col("c_st").cast("double") / col("n_s").cast("double") *
          log((col("c_st").cast("double") * col("n").cast("double")) /
            (col("n_s").cast("double") * col("c_t").cast("double"))))
          .as("term"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), sum(col("term")).as("kl"))
  }

  /** Jensen–Shannon drift per source against the REST of the corpus
    * (Lin 1991): JSD = ½KL(P‖M) + ½KL(Q‖M) with M the midpoint —
    * symmetric and bounded by ln 2, so sources are comparable on one
    * scale where [[sourceKl]]'s asymmetric number is not. Q is the
    * leave-one-out complement (c_t − c_st over n − n_s), not the full
    * corpus, so a dominant source cannot mask its own drift.
    *
    * The sum never materializes the out-of-source vocabulary: tokens
    * absent from the source contribute q·ln 2 each to KL(Q‖M), and
    * their total mass is 1 − Σ_{t∈source} q_t — one subtraction
    * closes the tail, keeping the aggregate on the (source, token)
    * table only. Same shuffle shape as [[sourceKl]].
    */
  def sourceJsDrift(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(tokens(col("text"))).as("t"))
    val st = tok.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c_st"))
    val gt = tok.groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = broadcast(gt.agg(sum(col("c_t")).as("n")))
    val ln2 = math.log(2.0)
    val joined = st.join(broadcast(gt), "t")
      .join(broadcast(ns), "source")
      .crossJoin(n)
      .withColumn("p", col("c_st").cast("double") / col("n_s").cast("double"))
      .withColumn("q",
        (col("c_t") - col("c_st")).cast("double") /
          (col("n") - col("n_s")).cast("double"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
    joined
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        sum(col("p") * log(col("p") / col("m"))).as("kl_p"),
        sum(when(col("q") > 0.0,
          col("q") * log(col("q") / col("m"))).otherwise(lit(0.0)))
          .as("kl_q_in"),
        sum(col("q")).as("q_mass_in"))
      .select(col("source"), col("n_tokens"),
        (lit(0.5) * col("kl_p") +
          lit(0.5) * (col("kl_q_in") +
            lit(ln2) * (lit(1.0) - col("q_mass_in")))).as("jsd"))
  }
}
