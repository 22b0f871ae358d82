package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline: token/char
  * stats, heuristic language ID, quality scoring, and document
  * fingerprinting — each a narrow projection over the `documents` table.
  *
  * Scale design: every operator here is a pure per-row map (no shuffle,
  * no UDF, fully codegen'd), so it scales linearly with input splits;
  * column pruning means only `doc_id` + `text` are read from parquet.
  */
object TextAnalysis {


  /** TF-IDF keyword extraction: the top-k characteristic terms per
    * document by tf·ln(N/df), ties broken by term — the keyword/topic
    * signal a corpus-curation pipeline attaches to every document.
    *
    * Scale shape: one explode + (doc, term) count (map-side partials
    * collapse repeats), one (term) aggregate for document frequency,
    * one broadcast-able scalar for N (a 1-row aggregate, never a
    * driver collect), one join back on term, one per-doc window for
    * the top-k. Nothing is quadratic; the widest shuffle is the
    * distinct (doc, term) set. ln() agrees across engines to ~1 ulp,
    * orders of magnitude inside the oracle compare's rounding.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(n)
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rn"))
  }

  /** Shard packing for training data: documents are packed in doc_id
    * order into shards of ~`tokensPerShard` whitespace tokens —
    * shard(doc) = floor(tokens-before-doc / tokensPerShard), the
    * deterministic layout a dataloader can reproduce from ids alone.
    *
    * The global ordered prefix sum is the textbook scale antipattern
    * as ONE window (a single ordered partition). Here it is two-level:
    * fixed-width doc_id buckets yield per-bucket totals (a tiny
    * relation — corpus/bucketWidth rows — whose running sum is a
    * cheap window), broadcast-joined back so the within-bucket cumsum
    * windows are each bounded by `bucketWidth` docs. Integer
    * arithmetic throughout, so the two-level sum is bit-identical to
    * the oracle's single global window.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 bucketWidth: Long = 1024L): DataFrame =
    tokenPrefix(docs, bucketWidth)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"__prefix div $tokensPerShard").as("shard"))

  /** Shard manifest for the [[packShards]] export — the integrity
    * artifact a 100 TB corpus delivery ships next to its shards: per
    * shard, document and token counts, the doc_id range, and an
    * ORDER-INDEPENDENT content checksum (bit_xor of the 60-bit text
    * fingerprints — XOR is commutative/associative, so the checksum is
    * identical under any partial-aggregation order and any partition
    * layout, with no overflow semantics to reconcile between engines,
    * unlike a wrapped BIGINT sum under ANSI mode). A consumer
    * re-derives the same manifest from the delivered shards and diffs;
    * one hash aggregate over the pack assignment, nothing collected.
    */
  def shardManifest(docs: DataFrame, tokensPerShard: Long): DataFrame =
    packShards(docs, tokensPerShard)
      .join(docs.select(col("doc_id"),
        hash60(lower(col("text"))).as("fp60")), "doc_id")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(fp60)").as("checksum"))
      .orderBy(col("shard"))

  /** Length-bucketed inference batching — the serving-side pack: docs
    * of similar token length batch together so one long outlier does
    * not pad out an entire batch (padding waste in a naive batcher is
    * the gap to the longest member; bucketing by power-of-two length
    * class bounds it to <2×). Within each class, batches fill to
    * `batchSize` docs in doc_id order.
    *
    * Output: (doc_id, n_tokens, len_class = ⌊log₂ tokens⌋, batch_id
    * dense within class). Pure integer arithmetic; the per-class
    * row_number window partitions by class (bounded count), and a
    * mass-class window is the same rank machinery every WindowGroupLimit
    * path here already survives.
    */
  def lengthBatches(docs: DataFrame, batchSize: Int): DataFrame = {
    val sized = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
      // exact integer log2 via decimal bin length (corpusStats idiom)
      .withColumn("len_class",
        (length(bin(col("n_tokens"))) - 1).cast("long"))
    sized
      .withColumn("batch_id",
        expr(s"(row_number() OVER (PARTITION BY len_class ORDER BY doc_id) - 1) div $batchSize"))
      .select(col("doc_id"), col("n_tokens"), col("len_class"), col("batch_id"))
  }

  /** Two-level distributed prefix sum of whitespace-token counts in
    * doc_id order: (doc_id, n_tokens, __prefix = tokens before this
    * doc). Fixed-width doc_id buckets yield per-bucket totals (a tiny
    * relation whose running sum is a cheap window), broadcast back so
    * each within-bucket cumulative window is bounded by `bucketWidth`
    * docs — bit-identical to a single global window, without the
    * one-reducer global sort.
    */
  private def tokenPrefix(docs: DataFrame, bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      expr(s"doc_id div $bucketWidth").as("__bucket"))
    val bucketOffsets = sized
      .groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btotal"))
      .withColumn("__boffset", coalesce(
        sum(col("__btotal")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__btotal")
    val within = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sized
      .join(broadcast(bucketOffsets), "__bucket")
      .withColumn("__prefix",
        col("__boffset") + coalesce(sum(col("n_tokens")).over(within), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("__prefix"))
  }

  /** Concat-and-chunk sequence packing — what an LM dataloader
    * actually consumes: the doc_id-ordered token stream cut into
    * fixed `seqLen`-token training sequences that CROSS document
    * boundaries (vs [[packShards]], which assigns whole documents to
    * budgeted shards). Emits one row per sequence: how many documents
    * contribute, the first/last contributing doc, and the token count
    * (`seqLen` everywhere but the final partial sequence).
    *
    * Shape: the [[tokenPrefix]] two-level prefix sum gives each doc
    * its global token offset; a doc overlapping k sequences explodes
    * into k rows (k = n_tokens/seqLen + 1 — bounded, never
    * token-granular), and one hash aggregate on seq_id finishes.
    * Overlap lengths are pure integer min/max arithmetic — exact in
    * both engines.
    */
  def packSequences(docs: DataFrame, seqLen: Long,
                    bucketWidth: Long = 1024L): DataFrame =
    tokenPrefix(docs, bucketWidth)
      .select(col("doc_id"), col("n_tokens"), col("__prefix"),
        explode(sequence(expr(s"__prefix div $seqLen"),
          expr(s"(__prefix + n_tokens - 1) div $seqLen"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(least(col("__prefix") + col("n_tokens"),
              (col("seq_id") + 1) * seqLen) -
            greatest(col("__prefix"), col("seq_id") * seqLen)).as("n_tokens"))

  /** Token / character statistics incl. a BPE-ish regex token count. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_uniq_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_word_tokens"))

  /** Language ID over the documents table — see [[langIdOn]]. */
  def langId(docs: DataFrame): DataFrame = langIdOn(docs, "doc_id", "text")

  /** Language ID by a char-bigram naive-Bayes classifier trained on
    * the seeded multilingual fixture ([[graft.functions.LangIdModel]]
    * — NOT on this corpus, so the scoring is an honest out-of-domain
    * application, replacing the marker-word heuristic whose own
    * confusion audit graded it decoration-grade): per document, each
    * language's integer log-likelihood sum over the document's char
    * bigrams, argmax with lexicographic tie-break.
    *
    * Output: (id, s_de, s_en, s_es, s_fr, s_zh, lang_pred) — scores
    * are ln-likelihoods scaled by 2^20 and rounded to BIGINT at
    * MODEL-BUILD time, so scoring is exact integer addition: combine
    * order cannot move a prediction, and the oracle consumes the
    * identical literal weight table.
    *
    * Scale shape: one bigram explode (O(total chars) rows) map-side
    * joined against the ≤ 5·128-row broadcast vocabulary (OOV weight
    * folded in as a literal), one id-keyed BIGINT sum. On THIS
    * synthetic corpus every document is drawn from the same
    * English-ish token soup regardless of its `lang` label (the
    * per-label token distributions are identical by construction), so
    * a heavily-'en' prediction column is the CORRECT reading of the
    * text; genuine multilingual discrimination is evidenced on the
    * held-out fixture split ([[langIdFixtureConfusion]]).
    */
  def langIdOn(rows: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.LangIdModel
    val spark = rows.sparkSession
    val model = spark.createDataFrame(LangIdModel.vocab.map {
        case (g, ws) => (g, ws(0), ws(1), ws(2), ws(3), ws(4)) })
      .toDF("gram", "w_de", "w_en", "w_es", "w_fr", "w_zh")
    val grams = rows
      .withColumn("__p", concat(lit(" "), lower(col(textCol)), lit(" ")))
      .select(col(idCol), explode(expr(
        "transform(sequence(1, length(__p) - 1), i -> substring(__p, i, 2))"))
        .as("gram"))
    val oov = LangIdModel.oov
    grams.join(broadcast(model), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("w_de"), lit(oov(0)))).as("s_de"),
        sum(coalesce(col("w_en"), lit(oov(1)))).as("s_en"),
        sum(coalesce(col("w_es"), lit(oov(2)))).as("s_es"),
        sum(coalesce(col("w_fr"), lit(oov(3)))).as("s_fr"),
        sum(coalesce(col("w_zh"), lit(oov(4)))).as("s_zh"))
      .withColumn("lang_pred",
        when(col("s_de") >= greatest(col("s_en"), col("s_es"),
          col("s_fr"), col("s_zh")), "de")
          .when(col("s_en") >= greatest(col("s_es"), col("s_fr"),
            col("s_zh")), "en")
          .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
  }

  /** Lang-ID confidence margin: per document, the best and runner-up
    * language scores and their gap — the routing-confidence signal a
    * pipeline thresholds before trusting a language assignment (a
    * small margin means "ambiguous, send to the fallback path"; on
    * this corpus margins are small because the text genuinely carries
    * little language signal, which is exactly what the column is
    * for). Scores are the integer NB log-likelihoods, so the sort and
    * the margin are exact in both engines.
    *
    * Scale shape: [[langIdOn]]'s explode + broadcast join + sum, then
    * a pure 5-element array_sort projection per row.
    */
  def langIdMargin(docs: DataFrame): DataFrame = {
    val arr = array_sort(array(col("s_de"), col("s_en"), col("s_es"),
      col("s_fr"), col("s_zh")))
    langId(docs)
      .withColumn("s_best", element_at(arr, 5))
      .withColumn("s_second", element_at(arr, 4))
      .select(col("doc_id"), col("lang_pred"), col("s_best"),
        col("s_second"), (col("s_best") - col("s_second")).as("margin"))
  }

  /** [[langIdConfusion]] over the fixture's HELD-OUT split — sentences
    * the model never trained on, in all five languages: the evaluation
    * that shows the classifier's genuine diagonal (the synthetic
    * `documents` corpus cannot, since its text carries no language
    * signal by construction).
    */
  def langIdFixtureConfusion(spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    val held = spark.createDataFrame(
      graft.functions.LangIdModel.HeldOut.zipWithIndex.map {
        case ((l, t), i) => (i.toLong, t, l) })
      .toDF("doc_id", "text", "lang")
    langIdConfusion(held)
  }

  /** Lang-ID confusion matrix: [[langId]]'s heuristic prediction
    * against the table's labeled `lang`, with per-true-language
    * recall — the audit that says WHICH languages the marker
    * heuristic confuses before anyone trusts its routing decisions.
    * Two hash aggregates over ≤ |langs|² rows plus a broadcastable
    * per-language total join; the ratio is an exact bigint-over-
    * bigint double division.
    */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val pred = langId(docs).select(col("doc_id"), col("lang_pred"))
    val joined = pred.join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val totals = joined.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_true"))
    joined.groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(totals.withColumnRenamed("lang", "lang_true")),
        "lang_true")
      .select(col("lang_true"), col("lang_pred"), col("n"), col("n_true"),
        (col("n").cast("double") / col("n_true").cast("double"))
          .as("frac"))
  }

  /** Quality scoring: type-token ratio, stopword ratio, length band.
    * Ratios are exact integer-over-integer double divisions — identical
    * bits in any IEEE-754 engine, so no rounding is needed for parity.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val stops = occurrences(padded(col("text")), " the ")
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (nUniq.cast("double") / nTok.cast("double")).as("ttr"),
      (stops.cast("double") / nTok.cast("double")).as("stop_ratio"),
      when(nTok.between(20, 2000) &&
             (nUniq.cast("double") / nTok.cast("double")) > 0.2, "keep")
        .otherwise("drop").as("verdict"))
  }

  /** Gopher-style quality rule battery (Rae et al. 2021, "Scaling
    * Language Models", table A1 — the document filters most public
    * curation stacks reuse): word-count band, mean-word-length band,
    * symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alphabetic-word fraction, and stopword presence. Emits one
    * boolean per rule plus the conjunction verdict, so a pipeline can
    * report WHY documents die, not just how many.
    *
    * Every rule is an INTEGER cross-multiplied comparison (e.g. mean
    * word length in [3,10] ⇔ `3·n ≤ Σlen ≤ 10·n`), so both engines
    * agree bit-for-bit with no float thresholds. Σ token length needs
    * no lambda: tokens split on single spaces, so
    * `Σlen = length(text) − (n_words − 1)` exactly. Line counts ride
    * `regexp_count` anchored on the injected `\n` sentinels. The one
    * higher-order function (alpha-word count) filters a per-row array
    * — no shuffle, bounded by the row. Pure projection: embarrassingly
    * parallel at any scale.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val (nW, rules) = gopherRuleExprs
    docs.select(
      (col("doc_id") +: nW.as("n_words") +:
        rules.map { case (n, c) => c.as(n) }) :+
        rules.map(_._2).reduce(_ && _).as("verdict"): _*)
  }

  /** The rule expressions behind [[gopherRules]], over `col("text")`:
    * (word count, named rule columns). Factored so the NB weak-labeler
    * ([[Curation.nbQualityModel]]) can evaluate the verdict inline in
    * the same projection that explodes tokens — no doc-keyed label
    * join at all.
    */
  private[operators] def gopherRuleExprs: (Column, Seq[(String, Column)]) = {
    val toks = tokens(col("text"))
    val nW = size(toks).cast("long")
    val sumLen = (length(col("text")).cast("long") - nW + 1L)
    val symbols = regexp_count(col("text"), lit("#|…|\\.\\.\\.")).cast("long")
    val nLines = size(split(col("text"), "\n", -1)).cast("long")
    val bullets = regexp_count(concat(lit("\n"), col("text")),
      lit("\n[-*•]")).cast("long")
    val ellipsis = regexp_count(concat(col("text"), lit("\n")),
      lit("(\\.\\.\\.|…)\n")).cast("long")
    val noAlpha = size(filter(toks, t => !t.rlike("[a-zA-Z]"))).cast("long")
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stops = stopSet.map(w =>
        when(instr(padded(col("text")), s" $w ") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val rules = Seq(
      "r_wordcount" -> nW.between(50L, 100000L),
      "r_meanlen" -> (sumLen >= nW * 3L && sumLen <= nW * 10L),
      "r_symbol" -> (symbols * 10L <= nW),
      "r_bullet" -> (bullets * 10L <= nLines * 9L),
      "r_ellipsis" -> (ellipsis * 10L <= nLines * 3L),
      "r_alpha" -> ((nW - noAlpha) * 5L >= nW * 4L),
      "r_stop" -> (stops >= 2L))
    (nW, rules)
  }

  /** The Gopher verdict (all seven rules) as one Column over
    * `col("text")`. */
  private[operators] def gopherVerdict: Column =
    gopherRuleExprs._2.map(_._2).reduce(_ && _)

  /** Corpus composition report: per (language, log₂ size class) doc
    * counts, token totals, and char totals — the histogram a curation
    * run publishes before/after each pass. The size class is the EXACT
    * integer log₂ (digit count of `bin(n_tokens)` minus one — no
    * floating log whose boundary rounding could differ across
    * engines). One partial+final hash aggregate; cardinality is
    * |langs| × ~40 classes, so the shuffle is trivially small.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_ch"))
      .groupBy(col("lang"),
        (length(bin(col("n_tok"))) - 1).cast("long").as("size_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_ch")).as("total_chars"))

  /** Vocabulary extraction for tokenizer training: the top-k corpus
    * terms by total occurrences (ties by term), with document
    * frequency alongside — the count table a BPE/unigram tokenizer
    * trainer consumes.
    *
    * Scale shape: one token explode into a (doc, term)-distinct-free
    * count — map-side partials collapse each split's repeats before
    * the (term) shuffle; `df` rides the same aggregate via a
    * count-distinct over doc_id (Spark expands it to one extra
    * (term, doc_id) dedup exchange, still term-keyed). The global
    * top-k is TakeOrderedAndProject — per-partition heaps of k, never
    * a full sort.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)

  /** Vocabulary-id tokenization — the last mile before the trainer:
    * map every token to its id in the [[vocabTopK]] vocabulary (rank
    * order; 0 = OOV/UNK) and emit each document's ordered id sequence.
    *
    * Scale shape: the vocabulary is `vocabSize` rows by construction —
    * its rank window runs over one tiny partition and the table
    * BROADCASTS, so the token→id map is a map-side hash join over the
    * token explode; the only wide shuffle is the per-doc ordered
    * reassembly. Ids are emitted comma-joined (pins order and values
    * for the oracle compare; `split().cast("array<int>")` recovers the
    * array).
    */
  def tokenize(docs: DataFrame, vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = vocabTopK(docs, vocabSize)
      .withColumn("tid", row_number()
        .over(Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      .select(col("term"), col("tid"))
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .join(broadcast(vocab), col("tok") === col("term"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(",", expr(
          "transform(array_sort(collect_list(struct(pos, tid))), x -> x.tid)"))
          .as("ids"))
  }

  /** Vocabulary-coverage report — the per-language OOV audit a
    * tokenizer team runs before freezing a vocabulary: for each
    * language, total tokens, tokens outside the corpus top-k
    * vocabulary, distinct OOV terms, and the OOV rate as an exact
    * BIGINT/BIGINT double. A vocabulary trained on a head-heavy
    * multilingual corpus quietly starves tail languages (the
    * coverage/fertility tables in the mT5 and XLM-R papers exist to
    * catch exactly this); this is that audit as one query.
    *
    * Scale shape: the vocabulary is k rows by construction and
    * BROADCASTS, so membership is a map-side hash lookup over the
    * token explode; everything then collapses into a
    * |languages|-row aggregate (partial map-side, one tiny shuffle).
    * One corpus scan total — the explode never persists and nothing
    * is ever collected.
    */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = vocabTopK(docs, vocabSize)
      .select(col("term"), lit(1).as("__in_vocab"))
    docs.select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), col("tok") === col("term"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"),
        countDistinct(when(col("__in_vocab").isNull, col("tok")))
          .as("n_oov_terms"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Document fingerprint: full md5 plus a 60-bit integer form usable as
    * a join/partition key.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(lower(col("text"))).as("fp"),
      hash60(lower(col("text"))).as("fp60"))

  /** Repetition-based quality signals (the C4/Gopher-style filters a
    * training-data pipeline drops boilerplate with): per document, the
    * fraction of word bigrams taken by the single most frequent one
    * (`top_frac`) and the fraction covered by bigrams occurring more
    * than once (`dup_frac`), plus a keep/drop verdict. Documents with
    * fewer than two tokens produce no row.
    *
    * Scale shape: one codegen'd bigram explode ([[Dedup.shingleRows]])
    * and two hash aggregations with map-side partials — no windows
    * over per-document arrays, no collect. Fractions are exact
    * bigint-over-bigint double divisions (bit-identical across
    * engines), so the verdict thresholds compare identically too.
    */
  def repetitionStats(docs: DataFrame,
                      maxTopFrac: Double = 0.2,
                      maxDupFrac: Double = 0.5): DataFrame = {
    val counts = Dedup.shingleRows(docs, 2, distinct = false)
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
           max(col("c")).as("top_gram"),
           coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup_grams"))
      .withColumn("top_frac",
        col("top_gram").cast("double") / col("n_grams").cast("double"))
      .withColumn("dup_frac",
        col("dup_grams").cast("double") / col("n_grams").cast("double"))
      .withColumn("verdict",
        when(col("top_frac") > maxTopFrac || col("dup_frac") > maxDupFrac,
          "drop").otherwise("keep"))
  }

  /** The FULL Gopher repetition battery (Rae et al. 2021 table A1,
    * "repetitious text" rows) extending [[repetitionStats]]'s bigram
    * pair: within-document duplicate-LINE fractions (by line count and
    * by character mass), the character fraction claimed by the single
    * most frequent n-gram for n ∈ {2,3,4}, and the character fraction
    * inside n-grams occurring more than once for n ∈ {5..10} — with
    * the paper's published drop thresholds conjoined into `verdict`.
    *
    * Scale shape: one line explode plus one [[Dedup.shingleRows]]
    * explode per n — ten doc_id-keyed hash aggregates with map-side
    * partials, re-joined on doc_id so ONE corpus partitioning serves
    * the whole chain; no per-document arrays, no windows over the
    * corpus, no collect. "Most frequent n-gram" counts only when it
    * actually REPEATS (count > 1 — a unique gram is not repetition, and
    * without that guard every short all-unique document trips the
    * 2-gram rule on its longest bigram); ties break by character mass,
    * packed with the count into ONE long (`c·2³⁶ + c·len`) so the
    * argmax stays a primitive-long HashAggregate — a `max(struct(…))`
    * formulation is ordered identically but falls back to
    * SortAggregate, resorting the whole gram stream. The packing is
    * exact while a gram's per-doc char mass stays under 2³⁶
    * (≈69 G chars inside one document — beyond any real document). All
    * fractions are exact bigint-over-bigint double divisions, so the
    * threshold compares agree bit-for-bit with the oracle.
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      greatest(length(col("text")).cast("long"), lit(1L)).as("chars"),
      size(split(col("text"), "\n", -1)).cast("long").as("n_lines"))

    val lineAgg = docs
      .select(col("doc_id"), explode(split(col("text"), "\n", -1)).as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
          .as("dup_lines"),
        coalesce(sum(when(col("c") > 1,
            col("c") * length(col("line")).cast("long"))), lit(0L))
          .as("dup_line_chars"))

    def grams(n: Int): DataFrame = Dedup.shingleRows(docs, n, distinct = false)
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("c"))
      .withColumn("clen", col("c") * length(col("shingle")).cast("long"))
    val Pack = 1L << 36
    def topAgg(n: Int): DataFrame = grams(n).groupBy(col("doc_id"))
      .agg((max(when(col("c") > 1, col("c") * Pack + col("clen"))) % Pack)
        .as(s"top_chars_$n"))
    def dupAgg(n: Int): DataFrame = grams(n).groupBy(col("doc_id"))
      .agg(coalesce(sum(when(col("c") > 1, col("clen"))), lit(0L))
        .as(s"dup_chars_$n"))

    val parts = Seq(lineAgg) ++ (2 to 4).map(topAgg) ++ (5 to 10).map(dupAgg)
    val full = parts.foldLeft(base)((acc, df) =>
      acc.join(df, Seq("doc_id"), "left"))
    def frac(num: Column, den: Column): Column =
      coalesce(num, lit(0L)).cast("double") / den.cast("double")
    val topThresh = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupThresh = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)
    val withFracs = full.select(
      (col("doc_id") +:
        frac(col("dup_lines"), col("n_lines")).as("dup_line_frac") +:
        frac(col("dup_line_chars"), col("chars")).as("dup_line_char_frac") +:
        ((2 to 4).map(n =>
          frac(col(s"top_chars_$n"), col("chars")).as(s"top_${n}_gram_char_frac")) ++
         (5 to 10).map(n =>
          frac(col(s"dup_chars_$n"), col("chars")).as(s"dup_${n}_gram_char_frac")))): _*)
    withFracs.withColumn("verdict",
      when(
        col("dup_line_frac") > 0.30 ||
          col("dup_line_char_frac") > 0.20 ||
          (2 to 4).map(n => col(s"top_${n}_gram_char_frac") > topThresh(n))
            .reduce(_ || _) ||
          (5 to 10).map(n => col(s"dup_${n}_gram_char_frac") > dupThresh(n))
            .reduce(_ || _),
        "drop").otherwise("keep"))
  }

  /** PII patterns, shared with the oracle. ASCII character classes
    * only (`\d` is ASCII in both Java regex and RE2 by default) and no
    * backreferences, so Spark and DuckDB match identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val DigitRunRe = "\\d{7,}"

  /** PII scrubbing — the anonymization pass a training-data pipeline
    * runs before anything else: redact emails, dotted-quad IPs, and
    * long digit runs (phone/account numbers), reporting how many of
    * each were found. Redaction is STAGED (emails, then IPs on the
    * email-scrubbed text, then digit runs on that) so each counter
    * sees exactly the text its pattern will rewrite and the engines
    * cannot disagree about overlapping matches.
    *
    * Scale: a pure per-row projection — no shuffle, no UDF; the regex
    * replaces are codegen'd and the repeated intermediate strings are
    * collapsed by subexpression elimination within the projection.
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = col(textCol)
    val s1 = regexp_replace(raw, EmailRe, "<EMAIL>")
    val s2 = regexp_replace(s1, Ipv4Re, "<IP>")
    df.select(col(idCol),
      regexp_count(raw, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(s1, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(s2, lit(DigitRunRe)).cast("long").as("n_digit_runs"),
      regexp_replace(s2, DigitRunRe, "<NUM>").as("scrubbed"))
  }

  /** Greedy longest-prefix subword segmentation — the WordPiece-style
    * ENCODE pass (Wu et al. 2016, sans the `##` continuation
    * alphabet): each word is consumed left to right, at every position
    * taking the LONGEST vocabulary entry matching the remaining
    * prefix; a position no entry covers consumes one UNK character.
    * Emits per-document `(n_words, n_pieces, n_unk)` — the
    * vocabulary-compression / OOV-rate report a tokenizer rollout
    * needs over a candidate corpus.
    *
    * The vocabulary is derived deterministically from the corpus
    * itself (top-`k` whole words plus top-`k` occurrence-weighted
    * 3-char prefixes, ties lexicographic), so both engines build the
    * identical table; a trained vocabulary drops in unchanged.
    *
    * Scale shape: like every real tokenizer pass ([[Bpe]] rationale),
    * the inner loop runs over the DISTINCT-WORD table, orders of
    * magnitude smaller than the corpus by Zipf's law, then joins back
    * to the doc→word stream (word table broadcasts when it fits). The
    * greedy match loop is genuinely imperative per word — no
    * relational form avoids the sequential position walk — so it runs
    * as a typed `mapPartitions` over the word table with the (tiny,
    * `require`-bounded) vocabulary broadcast; the DuckDB oracle walks
    * the same jump table with a recursive CTE, an independent
    * implementation of the same recurrence. ASCII-equal semantics:
    * JVM UTF-16 substring and SQL char-based substr agree on ASCII
    * corpora (documented caveat for astral-plane text).
    */
  def greedyPieces(docs: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 2048, "k in [1, 2048] keeps the vocab broadcastable")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val wc = d.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // feeds vocab (×2) and the walk
    val topWords = wc.orderBy(col("cnt").desc, col("word")).limit(k)
      .select(col("word").as("v"))
    val topPrefixes = wc.filter(length(col("word")) >= 3)
      .groupBy(substring(col("word"), 1, 3).as("v"))
      .agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("v")).limit(k)
      .select(col("v"))
    // ≤ 2k strings by construction — the one bounded collect
    val vocab = topWords.unionByName(topPrefixes).distinct()
      .as[String].collect().toSet
    val vocabBc = spark.sparkContext.broadcast(vocab)
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val segmented = wc.select(col("word")).as[String]
      .mapPartitions { it =>
        val vs = vocabBc.value
        it.map { w =>
          var pos = 0; var pieces = 0L; var unk = 0L
          while (pos < w.length) {
            var step = 0
            var l = math.min(maxLen, w.length - pos)
            while (l >= 1 && step == 0) {
              if (vs.contains(w.substring(pos, pos + l))) step = l
              l -= 1
            }
            if (step == 0) { step = 1; unk += 1 }
            pieces += 1; pos += step
          }
          (w, pieces, unk)
        }
      }.toDF("word", "n_pieces", "n_unk")
    d.join(segmented, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_unk")).as("n_unk"))
  }

  /** CCNet-style LM quality score (Wenzek et al. 2020 filter corpora
    * by KenLM perplexity; this is the in-engine analog with exact
    * cross-engine arithmetic): a corpus-trained add-one-smoothed
    * CONDITIONAL bigram model, scoring each doc by its mean
    * p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), reported in parts-per-million.
    * Unlike [[graft.operators.Curation.ngramFrequencyScore]] (mean
    * UNCONDITIONAL gram frequency), conditioning on the context
    * separates fluent word sequences from merely-common words — the
    * property an LM filter actually tests. Gibberish scores near
    * 1/V·1e6; natural text orders of magnitude higher.
    *
    * Determinism: each per-bigram ratio is one IEEE double division
    * (identical in any engine), then quantized to DECIMAL(38,18)
    * BEFORE summing — the sum is exact-decimal and order-independent,
    * so the final double division matches DuckDB bit-for-bit.
    *
    * Scale shape: two corpus-linear count aggregates (map-side
    * partials), one 1-row vocab aggregate broadcast, and a gram-keyed
    * join back to the per-doc gram stream before the doc_id re-agg —
    * all shuffles key on gram or doc_id, nothing quadratic. Stopword
    * contexts are heavy hitters on the c(w₁·) join; the counts side
    * is pre-aggregated (broadcasts at small SF, shuffle-joins at
    * scale) and AQE's skew split covers the probe.
    */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    val bg = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1").as("cw1"))
      .agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("w")).as("word"))
      .agg(countDistinct(col("word")).as("v"))
    bg.join(c12, Seq("w1", "w2"))
      .join(c1, col("w1") === col("cw1"))
      .crossJoin(broadcast(vocab)) // 1-row aggregate, broadcast
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(((col("c12") + lit(1.0)) / (col("c1") + col("v")))
          .cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("lm_ppm"))
  }

  /** Cross-corpus LM scoring — the shape CCNet actually ships (Wenzek
    * et al. 2020 train KenLM on *Wikipedia* and score the *crawl*):
    * bigram counts and vocabulary come from `train` only, and `score`
    * documents are rated against that fixed model. Unseen mass is
    * explicit: an unseen bigram backs off to the Laplace floor
    * `(0+1)/(c1+V)` (and `c1 = 0` when even the context is novel), and
    * `n_unseen` counts them — the domain-shift readout (a score slice
    * whose unseen rate spikes is out-of-distribution for the reference
    * corpus, regardless of its lm_ppm).
    *
    * Per-bigram terms are double-rounded then summed as
    * DECIMAL(38,18), so the total is partitioning-order-invariant and
    * oracle-exact. Scale shape: two count aggregations over the TRAIN
    * slice only, one 1-row vocab broadcast, then the score-side gram
    * stream left-joins the count tables (model-sized, not
    * corpus-sized) and re-aggregates per doc — the same
    * model-broadcast discipline as the streaming LM gate, expressed
    * relationally.
    */
  def bigramLmCrossScore(train: DataFrame, score: DataFrame): DataFrame = {
    def pairs(df: DataFrame) = df
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val tb = pairs(train)
    val c12 = tb.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = tb.groupBy(col("w1").as("cw1"))
      .agg(count(lit(1)).as("c1"))
    val vocab = train.select(explode(tokens(col("text"))).as("word"))
      .agg(countDistinct(col("word")).as("v"))
    pairs(score)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, col("w1") === col("cw1"), "left")
      .crossJoin(broadcast(vocab)) // 1-row aggregate, broadcast
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
        (sum(((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v")))
          .cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("lm_ppm"))
  }

  /** Interpolated Kneser–Ney bigram LM score (Kneser & Ney 1995; the
    * Chen & Goodman 1998 interpolated form — the smoothing KenLM
    * actually ships, so this is the closest in-engine analog of
    * CCNet's perplexity filter; [[bigramLmScore]] is the add-one
    * baseline). Per scored bigram:
    *
    *   p_KN(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
    *               + (D·N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/N₁₊(··)
    *
    * with absolute discount D = 3/4 (exact in binary) and N₁₊ the
    * distinct-continuation counts: the discount shaves mass off every
    * observed bigram and redistributes it through the CONTINUATION
    * probability — "how many contexts does w₂ complete" rather than
    * "how often does w₂ occur" — the property that famously stops
    * "Francisco" (frequent, but only ever after "San") from inflating
    * unseen-context estimates. Trained on the scored corpus itself,
    * every scored bigram has c ≥ 1 > D so the max(·−D, 0) clamp never
    * binds, and Σ over the vocabulary of p_KN(·|w₁) is exactly 1
    * (spec-pinned). Reported as mean p_KN per doc in ppm.
    *
    * Determinism: every factor is an integer count cast to double and
    * the per-bigram term is the SAME fixed-shape IEEE expression tree
    * in both engines, quantized to DECIMAL(38,18) before the sum (the
    * [[bigramLmScore]] discipline) — the aggregate is
    * partitioning-order-invariant and oracle-exact.
    *
    * Scale shape: three model aggregates (bigram counts; per-context
    * token total + distinct fan-out, one pass; per-continuation
    * distinct fan-in) and a 1-row bigram-type-count broadcast; the doc
    * gram stream joins the model-sized tables on w1/w2 and
    * re-aggregates per doc_id. Same skew posture as the add-one LM:
    * build sides are pre-aggregated (broadcast at small SF,
    * shuffle-join at scale), AQE skew split covers heavy stopword
    * contexts on the probe.
    */
  def knSmoothedLmScore(docs: DataFrame): DataFrame = {
    val bg = bigramStream(docs)
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = bg.groupBy(col("w1").as("cw1"))
      .agg(count(lit(1)).as("c1"), countDistinct(col("w2")).as("n1fwd"))
    val cont = bg.groupBy(col("w2").as("cw2"))
      .agg(countDistinct(col("w1")).as("n1bwd"))
    val types = bg.agg(countDistinct(col("w1"), col("w2")).as("n_types"))
    val d = lit(0.75)
    // fixed-shape double tree, mirrored verbatim in the oracle SQL
    val term =
      (col("c12").cast("double") - d) / col("c1").cast("double") +
        (d * col("n1fwd").cast("double") / col("c1").cast("double")) *
          (col("n1bwd").cast("double") / col("n_types").cast("double"))
    bg.join(c12, Seq("w1", "w2"))
      .join(ctx, col("w1") === col("cw1"))
      .join(cont, col("w2") === col("cw2"))
      .crossJoin(broadcast(types)) // 1-row aggregate, broadcast
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(term.cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("kn_ppm"))
  }

  /** The per-doc bigram stream both KN paths share. */
  private def bigramStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Rows probed by [[docsFingerprint]]'s content signature. */
  private val DocsFingerprintSample = 4096L

  /** (row count, content signature) of a documents relation — the
    * [[graft.operators.Similarity.corpusFingerprint]] pattern on the
    * text table: footer-stat count plus BIT_XOR of xxhash64(doc_id,
    * text) over the fixed doc_id probe window, so freshness checks on
    * a standing LM model cost O(sample), not O(corpus).
    */
  private[graft] def docsFingerprint(docs: DataFrame): (Long, Long) = {
    val n = docs.count()
    val sig = docs.filter(col("doc_id") < DocsFingerprintSample)
      .agg(coalesce(expr("bit_xor(xxhash64(doc_id, text))"), lit(0L))
        .as("sig")).head.getLong(0)
    (n, sig)
  }

  /** Materialize the Kneser–Ney bigram MODEL at rest — the four count
    * tables [[knSmoothedLmScore]] re-aggregates per query (c12: bigram
    * counts; ctx: per-context totals + distinct fan-out; cont:
    * per-continuation fan-in; types: the 1-row bigram-type count),
    * keyed by the corpus fingerprint so a regenerated corpus retrains
    * instead of silently scoring under stale counts. This is the
    * r15 standing-index pattern applied to the LM tier: at 100 TB the
    * model tables are bigram-TYPE-sized (≪ the token stream) and the
    * three full-corpus aggregate shuffles run once per corpus
    * version, not once per tier-split query. `meta` is written LAST —
    * the completeness marker.
    */
  def knModelWrite(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a half-written rebuild must read as incomplete (the
    // invalidateMarker discipline): drop the marker first
    val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaP)) { fs.delete(metaP, true); () }
    val bg = bigramStream(docs)
    bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .write.mode("overwrite").parquet(s"$path/c12")
    bg.groupBy(col("w1").as("cw1"))
      .agg(count(lit(1)).as("c1"), countDistinct(col("w2")).as("n1fwd"))
      .write.mode("overwrite").parquet(s"$path/ctx")
    bg.groupBy(col("w2").as("cw2"))
      .agg(countDistinct(col("w1")).as("n1bwd"))
      .write.mode("overwrite").parquet(s"$path/cont")
    bg.agg(countDistinct(col("w1"), col("w2")).as("n_types"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/types")
    // the add-one LM tier ([[bigramLmScoreAtRest]]) shares this layout
    // and needs the unigram vocabulary size — over ALL tokens (docs
    // below the bigram length floor still contribute words, matching
    // [[bigramLmScore]]'s vocab aggregate exactly)
    docs.select(explode(tokens(col("text"))).as("word"))
      .agg(countDistinct(col("word")).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    val (n, sig) = docsFingerprint(docs)
    Seq((n, sig)).toDF("built_n", "sig")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** True when a complete [[knModelWrite]] layout at `path` matches
    * `docs`' fingerprint — the build-if-stale guard.
    */
  def knModelFresh(spark: org.apache.spark.sql.SparkSession,
                   path: String, docs: DataFrame): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
    if (!metaP.getFileSystem(conf).exists(metaP)) return false
    // a layout written before the vocab table joined the format reads
    // as stale (one rebuild re-stamps it) — the add-one tier must
    // never find a fingerprint-fresh layout missing its table
    val vocabP = new org.apache.hadoop.fs.Path(s"$path/vocab")
    if (!vocabP.getFileSystem(conf).exists(vocabP)) return false
    val m = spark.read.parquet(s"$path/meta")
      .select(col("built_n"), col("sig")).head
    (m.getLong(0), m.getLong(1)) == docsFingerprint(docs)
  }

  /** [[knSmoothedLmScore]] against a STANDING [[knModelWrite]] model:
    * the per-doc gram stream joins the stored count tables instead of
    * re-aggregating them — bit-identical scores by construction (the
    * stored counts ARE the aggregates, and the per-bigram term is the
    * same fixed-shape double tree), so the oracle is unchanged.
    */
  def knSmoothedLmScoreAtRest(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    val bg = bigramStream(docs)
    val d = lit(0.75)
    val term =
      (col("c12").cast("double") - d) / col("c1").cast("double") +
        (d * col("n1fwd").cast("double") / col("c1").cast("double")) *
          (col("n1bwd").cast("double") / col("n_types").cast("double"))
    bg.join(spark.read.parquet(s"$path/c12"), Seq("w1", "w2"))
      .join(spark.read.parquet(s"$path/ctx"), col("w1") === col("cw1"))
      .join(spark.read.parquet(s"$path/cont"), col("w2") === col("cw2"))
      .crossJoin(broadcast(spark.read.parquet(s"$path/types")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(term.cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("kn_ppm"))
  }

  /** [[bigramLmScore]] against the STANDING [[knModelWrite]] layout —
    * the add-one tier rides the SAME model tables as KN (c12, ctx's
    * c1, and the vocab table): per-doc grams join the stored counts
    * instead of re-aggregating them, bit-identical by construction
    * (stored counts ARE the aggregates; the per-bigram ratio is the
    * same single IEEE division quantized to DECIMAL(38,18)), so the
    * oracle is unchanged. Builds the model when the corpus
    * fingerprint changed ([[knModelFresh]]).
    */
  def bigramLmScoreAtRest(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    if (!knModelFresh(spark, path, docs)) knModelWrite(docs, path)
    val bg = bigramStream(docs)
    bg.join(spark.read.parquet(s"$path/c12"), Seq("w1", "w2"))
      .join(spark.read.parquet(s"$path/ctx")
        .select(col("cw1"), col("c1")), col("w1") === col("cw1"))
      .crossJoin(broadcast(spark.read.parquet(s"$path/vocab")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(((col("c12") + lit(1.0)) / (col("c1") + col("v")))
          .cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("lm_ppm"))
  }

  /** [[bigramLmCrossScore]] with the TRAIN-slice model standing at
    * rest: counts and vocabulary resolve from a [[knModelWrite]]
    * layout keyed by the train slice's fingerprint (built when
    * stale), and the score-side gram stream left-joins them with the
    * same explicit unseen-bigram backoff — bit-identical scores,
    * oracle unchanged. The deployed-CCNet maintenance shape: the
    * reference model retrains when the REFERENCE corpus changes, not
    * once per scored crawl slice.
    */
  def bigramLmCrossScoreAtRest(train: DataFrame, score: DataFrame,
                               path: String): DataFrame = {
    val spark = train.sparkSession
    if (!knModelFresh(spark, path, train)) knModelWrite(train, path)
    bigramStream(score)
      .join(spark.read.parquet(s"$path/c12"), Seq("w1", "w2"), "left")
      .join(spark.read.parquet(s"$path/ctx")
        .select(col("cw1"), col("c1")), col("w1") === col("cw1"), "left")
      .crossJoin(broadcast(spark.read.parquet(s"$path/vocab")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
        (sum(((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v")))
          .cast("decimal(38,18)")).cast("double") * lit(1000000.0) /
          count(lit(1))).as("lm_ppm"))
  }

  /** [[knSmoothedLmScore]] with the build-if-stale convenience — the
    * [[knBucketsAtRest]] treatment for the bare KN score query: the
    * model aggregates run once per corpus version, the per-query cost
    * is gram-keyed joins against model-sized tables.
    */
  def knSmoothedLmScoreStanding(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    if (!knModelFresh(spark, path, docs)) knModelWrite(docs, path)
    knSmoothedLmScoreAtRest(docs, path)
  }

  /** [[knBuckets]] with the LM model resolved from (or built into)
    * the standing [[knModelWrite]] layout: the three full-corpus
    * model aggregates run only when the corpus fingerprint changed;
    * a fresh model turns the tier split into gram-keyed joins against
    * model-sized tables plus the distributed rank. Same result, same
    * oracle.
    */
  def knBucketsAtRest(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    if (!knModelFresh(spark, path, docs)) knModelWrite(docs, path)
    tierByScore(knSmoothedLmScoreAtRest(docs, path), "kn_ppm")
      .select(col("doc_id"), col("n_bigrams"), col("kn_ppm"), col("tier"))
  }

  /** Distributed NTILE(3) over (`scoreCol` DESC, doc_id) — the tier
    * assignment behind [[ccnetBuckets]]/[[knBuckets]], computed WITHOUT
    * the single-reducer global window a literal `ntile(3) OVER (ORDER
    * BY …)` compiles to. The machinery is the range-exchange two-level
    * rank this repo already trusts bit-exactly
    * ([[graft.operators.Dedup.snGlobalRank]],
    * [[graft.operators.Sampling.deterministicShuffle]]):
    * `repartitionByRange` reservoir-samples the ACTUAL (score, doc_id)
    * keys for its boundaries (so a degenerate score distribution still
    * splits across buckets), partition ids are monotone in the range
    * order, and bucket-prefix counts + a within-bucket physical row
    * offset compose to exactly the oracle's one global ROW_NUMBER. The
    * tile then falls out of the dense rank `r` over `N` rows by the
    * standard NTILE arithmetic — q = N div 3, rem = N mod 3, the first
    * `rem` tiles take q+1 rows — so the result is invariant to WHICH
    * boundaries the sample picked and bit-identical to the oracle's
    * NTILE(3).
    *
    * The ranked relation is lazily localCheckpoint-ed because two
    * consumers read it (the bucket-count table and the final join):
    * RangePartitioner re-samples per execution and
    * `monotonically_increasing_id` is nondeterministic, so offsets
    * from one sampling must never compose with local ranks from
    * another. Every window here runs over the ≤|partitions|-row bucket
    * table; no corpus-sized relation ever passes through one reducer.
    */
  /** The pre-checkpoint ranked relation behind [[tierByScore]]: range
    * exchange on (`scoreCol` DESC, doc_id), bucket-local sort, and the
    * zipWithIndex idiom for (bucket id, within-bucket rank) in one
    * pass. Factored out so its plan shape (a PARALLEL range exchange,
    * never a global sort) is pinnable — the checkpoint boundary in
    * [[tierByScore]] hides this subtree behind a Scan ExistingRDD.
    */
  private[graft] def rankKeyed(scored: DataFrame,
                               scoreCol: String): DataFrame = {
    val parts = math.max(1, scored.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)
    Ranks.bucketLocal(scored
      .repartitionByRange(parts, col(scoreCol).desc, col("doc_id"))
      .sortWithinPartitions(col(scoreCol).desc, col("doc_id")))
  }

  private[graft] def tierByScore(scored: DataFrame,
                                 scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = rankKeyed(scored, scoreCol).localCheckpoint(eager = false)
    val offsets = keyed.groupBy(col("__bucket"))
      .agg(Ranks.guardedBucketCount.as("__bn"))
      .withColumn("__boff", coalesce(
        sum(col("__bn")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n",
        sum(col("__bn")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .drop("__bn")
    keyed.join(broadcast(offsets), "__bucket")
      .withColumn("__rk", col("__boff") + col("__lrk"))
      // NTILE(3): first (N mod 3) tiles hold (N div 3)+1 rows each.
      // The ELSE divisor is 0 only when N < 3, where every row takes
      // the THEN branch (rk <= rem), so the division never evaluates.
      .withColumn("tier",
        element_at(lit(Array("head", "middle", "tail")),
          expr("""CASE WHEN __rk <= (__n % 3) * (__n div 3 + 1)
                 |  THEN cast((__rk - 1) div (__n div 3 + 1) + 1 as int)
                 |  ELSE cast(__n % 3 +
                 |    (__rk - (__n % 3) * (__n div 3 + 1) - 1)
                 |      div (__n div 3) + 1 as int)
                 |END""".stripMargin)))
      .drop("__bucket", "__lrk", "__boff", "__n", "__rk")
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3: corpora
    * are partitioned into thirds by LM perplexity, and models train on
    * the best tier): NTILE(3) over the [[bigramLmScore]] quality score,
    * best-scoring third labeled `head`. Ties break on doc_id, so the
    * split is deterministic and engine-portable. The tiering runs
    * through [[tierByScore]]'s range-sampled two-level rank — the
    * oracle keeps the literal global-window NTILE form, so the two
    * derivations check each other — and no corpus-sized relation ever
    * funnels through a single reducer.
    */
  def ccnetBuckets(docs: DataFrame): DataFrame =
    tierByScore(bigramLmScore(docs), "lm_ppm")
      .select(col("doc_id"), col("n_bigrams"), col("lm_ppm"), col("tier"))

  /** [[ccnetBuckets]] with the LM model standing at rest
    * ([[bigramLmScoreAtRest]] over the shared [[knModelWrite]]
    * layout) — the [[knBucketsAtRest]] treatment for the add-one
    * tier. Same result, same oracle.
    */
  def ccnetBucketsAtRest(docs: DataFrame, path: String): DataFrame =
    tierByScore(bigramLmScoreAtRest(docs, path), "lm_ppm")
      .select(col("doc_id"), col("n_bigrams"), col("lm_ppm"), col("tier"))

  /** The [[ccnetBuckets]] tier split under the smoothing CCNet's
    * deployed filter actually uses — NTILE(3) over the interpolated
    * Kneser–Ney score ([[knSmoothedLmScore]]) instead of the add-one
    * baseline. Same determinism story (bit-identical doubles, doc_id
    * tie-break) and the same distributed [[tierByScore]] rank.
    */
  def knBuckets(docs: DataFrame): DataFrame =
    tierByScore(knSmoothedLmScore(docs), "kn_ppm")
      .select(col("doc_id"), col("n_bigrams"), col("kn_ppm"), col("tier"))

  /** Feature-hashing document embeddings (the "hashing trick",
    * Weinberger et al. 2009): every token hashes to one of `dims`
    * buckets with a ±1 sign drawn from an independent hash, and the
    * document's vector is the signed count per bucket — the classic
    * cheap text→vector bridge (Vowpal Wabbit / fastText-bucket style)
    * that turns raw text into something the ANN tier can index with no
    * trained model in the loop. Output is the SPARSE form
    * (doc_id, dim, val): zero-sum buckets are dropped, and values are
    * exact BIGINTs, so the embedding is bit-reproducible across
    * engines, runs, and partitionings.
    *
    * Scale shape: one token explode (codegen) into one
    * (doc_id, dim)-keyed hash aggregation — map-side partials collapse
    * repeated tokens before the single shuffle, and the shuffle key
    * cardinality is ≤ docs·dims, independent of corpus token count.
    * No vocabulary, no fit step, no driver state.
    */
  def hashEmbed(docs: DataFrame, dims: Int): DataFrame = {
    require(dims > 0 && dims <= 4096, "bucket count must stay executor-sane")
    val tok = explode(tokens(col("text")))
    docs.select(col("doc_id"), tok.as("tok"))
      .select(col("doc_id"),
        pmod(hash60(col("tok")), lit(dims.toLong)).as("dim"),
        when(pmod(hash60(concat(lit("s:"), col("tok"))), lit(2L)) === 0,
          lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("val"))
      .filter(col("val") =!= 0)
  }

  /** Token frequency-of-frequencies spectrum — for each occurrence
    * count c, how many distinct terms occur exactly c times. This is
    * the input table to Good–Turing smoothing and the standard
    * vocabulary-health snapshot (the hapax-legomena count N₁ is its
    * first row; a corpus whose N₁ share balloons after a bad OCR batch
    * shows it here first).
    *
    * Scale shape: one term-count aggregation (the same shuffle
    * [[vocabTopK]] pays) collapsed into a second aggregate whose key
    * cardinality is the number of DISTINCT frequencies — O(√tokens)
    * by Zipf, a few thousand rows at any corpus size.
    */
  def freqSpectrum(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n_terms"))
      .select(col("c").as("occurrences"), col("n_terms"))

  /** Good–Turing adjusted counts (Good 1953) over the frequency
    * spectrum: for each occurrence class r with a populated successor
    * class, the adjusted count r* = (r+1)·N_{r+1} / N_r — emitted as
    * an EXACT rational (`r_star_num` = (r+1)·N_{r+1}, denominator
    * `n_r`), so no float division enters the comparison and both
    * engines agree bit-for-bit. The r=1 row's numerator over the
    * total token count is the classic unseen-mass estimate P₀.
    *
    * Scale shape: [[freqSpectrum]]'s two aggregations plus a self-join
    * over the O(√tokens)-row spectrum — the successor side broadcasts.
    */
  def goodTuring(docs: DataFrame): DataFrame = {
    val spec = freqSpectrum(docs)
    spec.as("a")
      .join(broadcast(spec.as("b")),
        col("b.occurrences") === col("a.occurrences") + 1L)
      .select(col("a.occurrences").as("r"),
        col("a.n_terms").as("n_r"),
        col("b.n_terms").as("n_r1"),
        ((col("a.occurrences") + 1L) * col("b.n_terms")).as("r_star_num"))
  }

  /** Count–min sketch frequency estimation (Cormode & Muthukrishnan
    * 2005) self-evaluated against exact counts: build a depth×width
    * counter sketch from one pass over the tokens, then estimate the
    * exact top-k terms' counts as the min over their depth buckets.
    * Output (term, exact, cms_est) — `cms_est ≥ exact` always (the CMS
    * one-sided guarantee), with equality when no collision touched all
    * depth rows. All hashes are the engine-portable md5-based
    * [[TextFunctions.hash60]] with per-row seeds, so the sketch —
    * unlike a real deployment's — is bit-reproducible and
    * oracle-checkable.
    *
    * Scale shape: one token scan exploding into depth narrow
    * (row, bucket) keys whose cardinality is depth·width regardless of
    * corpus size — map-side partials collapse almost everything before
    * the one tiny shuffle, and the finished sketch broadcasts to the
    * estimation join. The exact top-k pays the same term aggregation
    * [[vocabTopK]] does; at 100 TB the sketch path is the one you keep
    * and the exact path is the audit.
    */
  def cmsEstimate(docs: DataFrame, width: Int, depth: Int,
                  k: Int): DataFrame = {
    require(width > 0 && depth > 0 && width.toLong * depth <= (1 << 20),
      "sketch must stay broadcast-sized")
    val terms = docs.select(explode(tokens(col("text"))).as("term"))
    def buckets(term: Column): Column = array((0 until depth).map(r =>
      pmod(hash60(concat(lit(s"cms$r:"), term)), lit(width.toLong))): _*)
    val sketch = terms
      .select(posexplode(buckets(col("term"))).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val topk = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("term"))
      .limit(k)
    topk.select(col("term"), col("exact"),
        posexplode(buckets(col("term"))).as(Seq("r", "bucket")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("term"), col("exact"))
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** BM25 retrieval scoring (Robertson & Walker 1994; the Lucene
    * `1 + odds` idf variant that keeps every weight positive): score
    * each document containing at least one query term by
    * Σ_t idf(t) · tf·(k₁+1) / (tf + k₁·(1−b+b·dl/avgdl)) with
    * k₁=1.2, b=0.75 — the ranking function behind the lexical half of
    * every retrieval/RAG stack, and the relevance gate a
    * training-data pipeline uses to mine topic-targeted subsets.
    *
    * Determinism: each per-(doc,term) weight is a fixed tree of IEEE
    * double ops mirrored operation-for-operation in the oracle SQL,
    * quantized to DECIMAL(38,18) BEFORE the per-doc sum, so the sum
    * is exact-decimal and partitioning-invariant; the only
    * cross-engine wobble is ≤1 ulp in `ln`, absorbed by the gate's
    * 6-decimal rounding.
    *
    * Scale shape: the query-term filter is a literal in-set predicate
    * evaluated map-side at the scan (the corpus never shuffles rows
    * that miss the query), tf aggregates on (doc, term) with map-side
    * partials, df and the corpus stats are |Q|-row and 1-row
    * broadcasts, and the doc-length join keys on doc_id. Nothing is
    * quadratic; output is bounded by docs-with-a-hit.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 64,
      "query terms are a literal broadcast set")
    val dl = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val hits = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isInCollection(queryTerms))
    val tf = hits.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = hits.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1-row aggregate, broadcast
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("w",
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
          .cast("decimal(38,18)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("tf")).as("n_hits"),
        sum(col("w")).cast("double").as("bm25"))
  }

  /** Inverted-index posting-list heads: for the `k` highest-df terms,
    * the document frequency, total occurrence count, and the first
    * `headLen` doc_ids of the posting list (ascending, comma-joined) —
    * the index page a retrieval engine materializes per term, with the
    * head capped exactly the way a real index paginates.
    *
    * Scale shape: (term, doc) counts aggregate with map-side partials;
    * the top-k term table is a k-row broadcast; the head cap is a
    * rank-filtered window (Spark pushes it as WindowGroupLimit, so hot
    * stopword postings truncate map-side before the sort — the same
    * hot-key discipline as the dedup bucket caps). The bounded
    * collect_list holds ≤ headLen ids per group by construction.
    */
  def postingHeads(docs: DataFrame, k: Int, headLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && headLen > 0 && k.toLong * headLen <= (1 << 20),
      "the materialized head pages must stay driver-bounded")
    val pairs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val top = pairs.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cnt"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)
    val rn = row_number().over(
      Window.partitionBy(col("term")).orderBy(col("doc_id")))
    pairs.join(broadcast(top), Seq("term"))
      .withColumn("rn", rn)
      .filter(col("rn") <= headLen)
      .groupBy(col("term"), col("df"), col("cnt"))
      .agg(array_join(
        transform(array_sort(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("head"))
  }

  /** Vocabulary-growth curve (the Heaps'-law audit): for each document
    * that introduces at least one never-seen-before term (by doc_id
    * order), the number of new terms it contributes and the cumulative
    * vocabulary size after it. Curation uses the curve two ways: a
    * flattening tail says the corpus has stopped teaching the
    * tokenizer new types (diminishing returns for vocab training), and
    * a sudden jump flags a contamination/format break mid-corpus.
    *
    * Scale shape: one (term, doc) distinct + a term-keyed min — both
    * map-side-partial aggregations — then a per-first-doc count. The
    * per-first-doc relation is bounded by min(#docs, |vocab|), which
    * early-corpus is ≈ #docs, so the cumulative sum runs through the
    * two-level distributed prefix sum ([[tokenPrefix]]'s shape):
    * fixed-width doc_id buckets yield per-bucket totals (a tiny
    * relation whose running sum is a cheap window, broadcast back),
    * and each within-bucket cumulative window is bounded by
    * `bucketWidth` docs — bit-identical to the single global window,
    * without the one-reducer global sort.
    */
  def vocabGrowth(docs: DataFrame, bucketWidth: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(min(col("doc_id")).as("first_doc"))
    val grouped = firstSeen.groupBy(col("first_doc"))
      .agg(count(lit(1)).as("new_terms"))
      .withColumn("__bucket", expr(s"first_doc div $bucketWidth"))
    val offsets = grouped.groupBy(col("__bucket"))
      .agg(sum(col("new_terms")).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bt")
    val within = Window.partitionBy(col("__bucket"))
      .orderBy(col("first_doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped.join(broadcast(offsets), "__bucket")
      .withColumn("cum_vocab",
        col("__boff") + sum(col("new_terms")).over(within))
      .select(col("first_doc"), col("new_terms"), col("cum_vocab"))
  }

  /** Fixed-size token chunking with stride (the RAG/embedding-prep
    * split: windows of `chunk` tokens starting every `stride` tokens,
    * so consecutive chunks overlap by `chunk − stride`): emits
    * (doc_id, chunk_id, n_tokens, chunk_text) with the trailing chunk
    * short when the document ends mid-window. `stride = chunk` is
    * exact partitioning (token conservation, spec-pinned); smaller
    * strides give the overlap an embedding pipeline wants so no
    * semantic span straddles a hard cut.
    *
    * Scale shape: a pure per-row explode — starts come from a
    * `sequence` over the doc's own length, so output rows are
    * Σ ⌈dl/stride⌉ with no shuffle at all; chunk slicing is codegen
    * array arithmetic. Embarrassingly parallel at any corpus size.
    */
  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * the lexical [[bm25]] ranking and the dense cosine ranking each
    * nominate their top-`n`, and a candidate's fused score is
    * Σ 1/(kRrf + rank) over the lists that contain it — the standard
    * zero-tuning way to combine heterogeneous retrievers (RRF needs no
    * score calibration because only RANKS cross the fence).
    *
    * The dense query is an in-corpus vector (`queryVecId`, the same
    * convention as the sim_topk oracles); embeddings join documents on
    * the shared id space. Ranks use (score desc, id) ordering so ties
    * are deterministic, and the fused score is a fixed two-term IEEE
    * expression — both engines agree bit-for-bit.
    *
    * Scale shape: each side reduces to its top-`n` with
    * TakeOrderedAndProject BEFORE any window (the rank windows run
    * over ≤n rows, never the corpus); the fusion is an n-row full
    * outer join. The corpus is scanned once per retriever — exactly
    * the fan-in a production hybrid does per query batch.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String], queryVecId: Long,
                n: Int, k: Int, kRrf: Int = 60): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, dot, norm}
    require(n > 0 && k > 0 && kRrf > 0)
    val lexTop = bm25(docs, queryTerms)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(n)
    val lexRanked = lexTop.withColumn("bm25_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25").desc, col("doc_id"))))
    val c = embeddings.select(col("vec_id"),
        asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = c.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val denTop = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id").as("doc_id"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
      .limit(n)
    val denRanked = denTop.withColumn("cos_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cos_sim").desc, col("doc_id"))))
    lexRanked.join(denRanked, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        (coalesce(lit(1.0) / (col("bm25_rank") + lit(kRrf)), lit(0.0)) +
          coalesce(lit(1.0) / (col("cos_rank") + lit(kRrf)), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  def chunkStride(docs: DataFrame, chunk: Int, stride: Int): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      "stride beyond the chunk size would drop tokens")
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        // greatest(…, 0) guards the sequence upper bound: tokens()
        // never returns an empty array today (split keeps the empty
        // string), but a tokenizer that filtered empties would
        // otherwise throw "illegal sequence boundaries" at runtime
        explode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(stride))).as("st"))
      .select(col("doc_id"),
        (col("st").cast("long") / lit(stride)).cast("long").as("chunk_id"),
        size(slice(col("w"), col("st") + 1, lit(chunk))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("w"), col("st") + 1, lit(chunk)), " ")
          .as("chunk_text"))
  }

  /** Per-language tokenizer fertility audit: how many subword pieces
    * the [[greedyPieces]] segmenter spends per word, and how many
    * characters each piece covers, aggregated by language. Fertility
    * parity is the multilingual-tokenizer health check (a language
    * whose words shatter into 2-3× more pieces than English pays
    * 2-3× the sequence length for the same content — the standard
    * argument for rebalancing the tokenizer training mix). Ratios are
    * exact bigint-over-bigint double divisions; everything else is
    * BIGINT, so the table is oracle-exact.
    *
    * Scale shape: [[greedyPieces]]'s word-distinct segmentation (its
    * vocab is a bounded ≤2k collect) plus one doc_id-keyed join
    * against the (lang, chars) projection and a |langs|-row rollup.
    */
  def pieceFertility(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_ch"))
      .join(greedyPieces(docs, k), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_unk")).as("n_unk"),
        sum(col("n_ch")).as("n_chars"),
        (sum(col("n_pieces")).cast("double") /
          sum(col("n_words")).cast("double")).as("pieces_per_word"),
        (sum(col("n_ch")).cast("double") /
          sum(col("n_pieces")).cast("double")).as("chars_per_piece"))

  /** PMI collocations (Church & Hanks 1990): adjacent token pairs
    * whose joint probability beats independence by at least
    * `minRatio`, with a minimum pair count. The PMI cutoff is applied
    * as an EXACT integer cross-multiplication — c₁₂·N ≥ minRatio·c₁·c₂
    * with integral `minRatio` — so the filter never compares floats
    * across engines; the emitted `pmi` double (ln of the ratio) is a
    * value column only. Both sides of the cross-multiply run in
    * DECIMAL(38,0): at target corpus sizes (N ~ 10¹³ tokens, common
    * unigrams c₁·c₂ ~ 10²⁰) the products overflow BIGINT, where
    * non-ANSI Spark would wrap silently while the oracle engine
    * raises — decimal keeps the filter exact AND the engines agreed
    * up to ~10³⁸.
    *
    * Scale shape: one explode over adjacent positions → three hash
    * aggs (pair counts, left counts, right counts) → two broadcastable
    * joins keyed on single tokens (unigram tables are O(vocab), tiny
    * next to the pair table); the total-N scalar joins as a 1-row
    * broadcast cross. No windows, no collects.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 3,
                      minRatio: Long = 2): DataFrame = {
    val w = docs.select(tokens(col("text")).as("w"))
    val pairs = w.filter(size(col("w")) >= 2)
      .select(explode(sequence(lit(0), size(col("w")) - 2)).as("i"), col("w"))
      .select(element_at(col("w"), col("i") + 1).as("w1"),
        element_at(col("w"), col("i") + 2).as("w2"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val pc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    pc.join(broadcast(uni.withColumnRenamed("t", "w1")
          .withColumnRenamed("c", "c1")), "w1")
      .join(broadcast(uni.withColumnRenamed("t", "w2")
          .withColumnRenamed("c", "c2")), "w2")
      .crossJoin(broadcast(total))
      .filter(col("c12").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")
        >= lit(minRatio).cast("decimal(38,0)") *
          col("c1").cast("decimal(38,0)") * col("c2").cast("decimal(38,0)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        log(col("c12").cast("double") * col("n").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))).as("pmi"))
  }

  /** Flesch reading-ease per document from three regex-countable
    * proxies: words (whitespace tokens), sentences (runs of `.!?`,
    * min 1), and syllables (runs of `aeiouy` per word, min 1 per word
    * — the standard heuristic; both engines count via
    * regexp_extract_all so the proxy is reproduced exactly).
    * FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    *
    * Pure per-row projection — zero shuffles, fully codegen,
    * embarrassingly parallel at any scale.
    */
  def readability(docs: DataFrame): DataFrame = {
    val nw = size(tokens(col("text")))
    val ns = greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
    // min-1-per-word: count vowel groups, then add 1 for each word
    // with none — equivalently words + max(0, groups - wordsWithVowel)
    val groups = size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    val wordsNoVowel = size(
      expr("filter(split(text, ' ', -1), x -> lower(x) NOT RLIKE '[aeiouy]')"))
    val syl = groups + wordsNoVowel
    docs.select(col("doc_id"),
      nw.cast("long").as("n_words"),
      ns.cast("long").as("n_sentences"),
      syl.cast("long").as("n_syllables"),
      (lit(206.835)
        - lit(1.015) * (nw.cast("double") / ns.cast("double"))
        - lit(84.6) * (syl.cast("double") / nw.cast("double"))).as("flesch"))
  }

  /** Zipf's-law fit over the top-`k` vocabulary: least-squares slope
    * and intercept of ln(count) against ln(rank) (Zipf 1949 predicts
    * slope ≈ −1). Rank ties break on the term so both engines agree on
    * the exact top-k set and ordering.
    *
    * Scale shape: one token hash-agg, then a DISTRIBUTED top-k
    * (orderBy+limit = TakeOrderedAndProject — no global sort
    * materializes), and only then a window + regression over the k
    * surviving rows. The single-partition window is over ≤ k rows by
    * construction, never over the vocabulary.
    */
  def zipfSlope(docs: DataFrame, k: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t"))
      .limit(k)
    val ranked = top.withColumn("rk",
      row_number().over(Window.orderBy(col("c").desc, col("t"))))
    val xy = ranked.select(log(col("rk").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    val sums = xy.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").cast("long").as("n_terms"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  /** Per-document token Shannon entropy H = −Σ p·ln p plus the
    * type-normalized form H/ln(types) ∈ [0,1] — the lexical-diversity
    * metric that separates natural prose from keyword-stuffed or
    * looping machine output (low-entropy docs repeat few tokens;
    * norm_entropy 1 means perfectly uniform usage). Complements
    * [[repetitionStats]]' positional repetition with a
    * position-blind distributional measure.
    *
    * Scale shape: one (doc_id, token) hash aggregate, a doc_id-keyed
    * rollup riding the same partitioning, and a final doc_id group —
    * all three shuffles on the document key, nothing corpus-global.
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val tot = tc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"))
    tc.join(tot, "doc_id")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), max(col("n_types")).as("n_types"),
        (-sum(col("c").cast("double") / col("n").cast("double") *
          log(col("c").cast("double") / col("n").cast("double"))))
          .as("entropy"))
      .withColumn("norm_entropy",
        when(col("n_types") > 1L,
          col("entropy") / log(col("n_types").cast("double")))
          .otherwise(lit(0.0)))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"): candidate phrases are
    * maximal token runs between stopword delimiters; each word scores
    * degree/frequency (degree = Σ lengths of phrases containing it,
    * frequency = its occurrence count), and a phrase scores the sum
    * of its words' scores. Emits every distinct phrase occurring at
    * least `minCount` times with its length, corpus frequency, and
    * score — the ROW SET is decided by the integer frequency cutoff
    * (the float score is a value column only, the same discipline as
    * PMI: no double comparison picks rows).
    *
    * Scale shape: one posexplode, a per-doc window for the running
    * stopword count (partitioned by doc_id, never global), phrase and
    * word hash aggregates (vocabulary/phrase-universe scaled), and a
    * broadcastable word-stats join. Nothing quadratic, no top-k over
    * floats.
    */
  def rakePhrases(docs: DataFrame,
                  stop: Seq[String] = Seq("a", "the", "of", "and", "to"),
                  minCount: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "word")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = e
      .withColumn("is_stop", col("word").isInCollection(stop))
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(win))
      .filter(!col("is_stop"))
    val phrases = marked.groupBy(col("doc_id"), col("phrase_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("word"))))
        .as("ws"))
      .select(col("doc_id"),
        expr("array_join(transform(ws, x -> x.word), ' ')").as("phrase"),
        size(col("ws")).cast("long").as("n_words"))
    val wordStats = phrases
      .select(explode(split(col("phrase"), " ")).as("word"), col("n_words"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
    val scores = phrases.select(col("phrase")).distinct()
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("word"))
      .join(broadcast(wordStats), "word")
      .groupBy(col("phrase"))
      .agg(sum(col("deg").cast("double") / col("freq").cast("double"))
        .as("score"))
    phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("freq_phrase"), max(col("n_words")).as("n_words"))
      .filter(col("freq_phrase") >= minCount)
      .join(scores, "phrase")
      .select(col("phrase"), col("n_words"), col("freq_phrase"), col("score"))
  }

  /** Per-document sentence-length profile: sentence count (non-empty
    * runs between `.!?` delimiters), token total over sentences, and
    * the longest sentence in tokens — the granular companion to
    * [[readability]]'s single score (a 400-token run-on fails a
    * training-data gate that a mean alone would pass). Segment and
    * token filters are mirrored EXPLICITLY in the oracle (empty
    * segments and empty tokens dropped on both sides) so neither
    * engine's split-semantics edge cases decide a row. Pure per-row
    * higher-order array arithmetic — zero shuffles.
    */
  def sentenceStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr("filter(transform(split(text, '[.!?]+'), " +
          "s -> size(filter(split(trim(s), ' ', -1), x -> x != ''))), " +
          "n -> n > 0)").as("lens"))
      .select(col("doc_id"),
        size(col("lens")).cast("long").as("n_sentences"),
        coalesce(expr("aggregate(lens, 0L, (a, x) -> a + x)"), lit(0L))
          .as("sent_tokens"),
        coalesce(expr("array_max(lens)"), lit(0)).cast("long")
          .as("max_sent_tokens"))
      .withColumn("mean_sent_tokens",
        when(col("n_sentences") > 0,
          col("sent_tokens").cast("double") /
            col("n_sentences").cast("double"))
          .otherwise(lit(0.0)))

  /** Per-document DEFLATE compression ratio — the quality signal the
    * Gopher/RefinedWeb pipelines gate on (machine-generated or
    * template text compresses far better than natural prose; binary
    * junk barely compresses at all). REAL zlib (java.util.zip
    * .Deflater, level 6, raw stream), run as a typed narrow map with
    * per-row finish — zero shuffles, embarrassingly parallel.
    *
    * ROWS-ONLY TIER (no DuckDB oracle — SQL engines don't expose
    * zlib): determinism and the discriminating behavior are pinned by
    * `CompressRatioSpec` instead, the same treatment as the HLL and
    * approx-percentile tiers.
    */
  def compressionRatio(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val d = new java.util.zip.Deflater(6, true)
          d.setInput(raw); d.finish()
          var buf = new Array[Byte](raw.length + 64)
          var n = 0
          while (!d.finished()) {
            if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
            n += d.deflate(buf, n, buf.length - n)
          }
          d.end()
          (id, raw.length.toLong, n.toLong,
            n.toDouble / math.max(1, raw.length).toDouble)
        }
      }.toDF("doc_id", "n_raw", "n_deflate", "ratio")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * per-document PageRank over the word co-occurrence graph —
    * adjacent-token edges, symmetrized — then the top-k words per
    * document by rank (ties → word). The graph-centrality complement
    * to [[tfidfTopTerms]]: TF-IDF scores words by corpus rarity,
    * TextRank by how central a word sits in ITS OWN document's
    * co-occurrence structure, no corpus statistics at all.
    *
    * Scale shape: every document's graph iterates SIMULTANEOUSLY —
    * the node key is (doc_id, word), so one join-aggregate round
    * advances the power iteration for the whole corpus at once, and
    * the rank table reuses the same (doc_id, word) hash partitioning
    * every round (per-doc graphs are a few hundred nodes; nothing
    * about any single document bounds the cluster). Ranks live on the
    * [[Graphs.pageRank]] integer grid with floor division at every
    * step, so results are bit-identical across engines, partitionings
    * and cluster sizes; the top-k window is rank-truncated map-side
    * by WindowGroupLimit.
    *
    * Memory discipline at 100× (both measured the hard way at the
    * synthesized sf10 on an 8 GiB heap):
    *  - NO per-round caching. The iteration count is FIXED and small,
    *    so the repeated edge/node/degree subtrees are collapsed by
    *    runtime exchange reuse inside the ONE final plan — caching
    *    them as deserialized localCheckpoint blocks (the unbounded-
    *    round discipline of [[graft.operators.Dedup
    *    .duplicateClusters]]) holds corpus-sized object graphs on
    *    heap across rounds and OOMs where exchange reuse streams
    *    from shuffle files.
    *  - ADAPTIVE partition width: the round partitioning comes from
    *    the corpus's token mass (pairs ≈ 2·Σ(|w|−1), one cheap
    *    aggregate) divided by `targetRowsPerTask`, never below the
    *    session's shuffle-partition setting — a fixed count hands
    *    every join/aggregate task a corpus-proportional hash state.
    *    The edge relation is hash-repartitioned ONCE on (doc_id,
    *    src); the distinct and degree aggregate inherit that width
    *    exchange-free (their keys contain the partitioning keys),
    *    the per-doc node count rides a doc-keyed window at the same
    *    width (never a broadcast — a one-row-per-document table
    *    grows with the corpus), and the contribution aggregate
    *    re-shuffles at the same bounded width. The pair-grain shuffle
    *    is the irreducible SpMV volume: a map-side pre-aggregation
    *    combines nothing at the (doc_id, src) partitioning (< 1 row
    *    per (doc_id, dst) group per task — measured 94.1 s vs 85.6 s
    *    at sf10), so the spill lever is per-task aggregate state:
    *    targetRowsPerTask = 500k keeps 32 concurrent hash maps well
    *    inside an 8 GiB heap where the r10 1.5M setting spilled
    *    (SCALING_r10's 11.98× decade-2 residual).
    */
  def textrank(docs: DataFrame, iters: Int = 3, k: Int = 3,
               scale: Long = 1000000L,
               targetRowsPerTask: Long = 500000L): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val approxPairs = toks
      .agg(coalesce(sum(size(col("w")) - 1), lit(0L)).as("n"))
      .head().getLong(0) * 2L
    val base = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // width rounded UP to a multiple of the session width: a count
    // marginally above `base` (e.g. 34 tasks on 32 cores) schedules a
    // nearly-empty second wave that doubles the stage wall for no
    // state reduction; whole multiples keep every wave full. Logged
    // because the r12→r13 "regression" hunt needed exactly this
    // number to tell a plan change from box noise (it was noise: at
    // sf0.1 approxPairs = 531k → parts = 32 under BOTH the 500k and
    // the old 1.5M setting — plan-identical, and a quiet paired A/B
    // measured r11 4.11 s vs r12 4.13 s).
    val parts = math.max(base,
      base * ((approxPairs + targetRowsPerTask * base - 1) /
        (targetRowsPerTask * base)).toInt)
    System.err.println(
      s"[textrank] approxPairs=$approxPairs parts=$parts base=$base")
    val prs = toks.select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(w)-2), i -> struct(w[i] AS a, w[i+1] AS b))"))
          .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    // repartition BEFORE distinct: (doc_id, src) is a subset of the
    // distinct keys, so the dedup aggregate inherits the width
    val edges = prs
      .select(col("doc_id"), col("a").as("src"), col("b").as("dst"))
      .unionByName(
        prs.select(col("doc_id"), col("b").as("src"), col("a").as("dst")))
      .repartition(parts, col("doc_id"), col("src"))
      .distinct()
    // per-doc node count attached ONCE by a doc-keyed window (NOT a
    // broadcast of a one-row-per-document table, which would grow
    // with the corpus and hit the broadcast size ceiling exactly
    // where this operator is supposed to scale); the window's
    // exchange is the bounded `parts` width
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val nodesN = edges.select(col("doc_id"), col("src").as("word")).distinct()
      .repartition(parts, col("doc_id"))
      .withColumn("n", count(lit(1)).over(wN))
    val deg = edges.groupBy(col("doc_id"), col("src"))
      .agg(count(lit(1)).as("deg"))
    val teleportNum = scale * 15L / 100L
    var ranks = nodesN
      .select(col("doc_id"), col("word"),
        expr(s"${scale}L div n").as("rank"))
    for (_ <- 1 to iters) {
      // A map-side pre-aggregation does NOT help here (measured at
      // sf10: 94.1 s vs 85.6 s for this shape): the partitioning is
      // (doc_id, src), so a task holds < 1 contribution per
      // (doc_id, dst) group and the partial HashAggregate combines
      // nothing while paying a full hash pass. The raw pair-grain
      // shuffle is the irreducible SpMV volume; the spill lever is
      // per-task aggregate STATE, which `parts` (sized from token
      // mass via targetRowsPerTask) keeps inside the heap.
      val contribs = edges
        .join(ranks.select(col("doc_id"), col("word").as("src"), col("rank")),
          Seq("doc_id", "src"))
        .join(deg, Seq("doc_id", "src"))
        .select(col("doc_id"), col("dst").as("word"),
          expr("rank div deg").as("c"))
        .repartition(parts, col("doc_id"), col("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(sum(col("c")).as("inr"))
      ranks = nodesN
        .join(contribs, Seq("doc_id", "word"), "left")
        .select(col("doc_id"), col("word"),
          (expr(s"${teleportNum}L div n") +
            expr("(85 * coalesce(inr, 0L)) div 100")).as("rank"))
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rank").desc, col("word"))
    ranks.withColumn("rn", row_number().over(win).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("rank"), col("rn"))
  }
}
