package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016), the
  * missing half of a tokenization pipeline ([[TextAnalysis.tokenize]]
  * applies a fixed vocabulary; this LEARNS one): start from characters,
  * repeatedly merge the globally most-frequent adjacent symbol pair.
  *
  * Like every real BPE trainer, the merge loop runs over the distinct
  * WORD-COUNT table, not the corpus: Zipf's law makes the word table
  * orders of magnitude smaller than the corpus (the one corpus-sized
  * pass is the initial word count — one explode + hash agg). Each merge
  * round is then (a) one pair-count aggregate over the word table with
  * map-side partials and (b) ONE driver-collected row (the argmax pair
  * — bounded by construction), followed by a codegen'd per-row symbol
  * rewrite. At 100 TB the word table is ~10⁸ rows; R rounds cost R
  * small aggregates, never another corpus scan.
  *
  * Merge application is a DETERMINISTIC double-pass boundary replace:
  * symbols live in a space-joined string padded with sentinels, and
  * ` a b ` → ` ab ` runs twice because consecutive occurrences share
  * their boundary space (the first pass takes every other occurrence of
  * a self-adjacent run, the second takes the rest — two passes always
  * suffice since pass one leaves no two missed occurrences adjacent).
  * For a run of a self-overlapping pair (`a a a a a`) the second pass
  * merges the LAST eligible occurrence where canonical left-to-right
  * BPE merges the one after the first — a documented, deterministic
  * variant; both engines' `replace` scans left-to-right non-overlapping
  * so the oracle reproduces every round bit-for-bit.
  *
  * Tie-breaking: highest pair count, then lexicographically smallest
  * pair — fully deterministic, partitioning-invariant (counts are
  * exact integers).
  */
object Bpe {

  /** Space-separated character symbols of a word ("hello" → "h e l l o"). */
  private def charSyms(word: org.apache.spark.sql.Column) =
    rtrim(regexp_replace(word, "(.)", "$1 "))

  /** (word, sym, cnt) after `merges` accepted BPE merges, plus the
    * merge list. The returned frames: merges = (step, pair, merged,
    * freq); syms = the segmentation map (word → final space-joined
    * symbols).
    *
    * `batch = 1` is canonical sequential BPE: one pair-count job and
    * ONE collected argmax row per merge. Real tokenizers need 10⁴–10⁵
    * merges, and one driver-synchronized job per merge makes that
    * hours of scheduler latency — so `batch > 1` accepts up to `batch`
    * NON-INTERACTING merges per round from one top-`batch` collect
    * (bounded rows, deterministic order): walking candidates by
    * (freq DESC, pair), a pair is accepted iff neither of its symbols
    * nor its merged string collides with any symbol or merged string
    * already accepted this round. Disjoint symbol sets make the
    * in-round rewrites commute and leave each accepted pair's count
    * exactly its round-start count; the divergence from sequential
    * BPE is only that a pair CREATED by an earlier in-round merge
    * cannot outrank a later accepted one mid-round — the standard
    * batched-BPE approximation, deterministic on both engines, and
    * exact (= sequential) whenever the top pairs don't interact
    * (spec-pinned in BpeSpec). Cost model: rounds ≈ merges /
    * (accepted per round), so 10⁴ merges at batch=64 is ~10² small
    * word-table aggregates — cluster-feasible where 10⁴ sequential
    * jobs are not.
    *
    * Each batched round materializes its rewritten symbols
    * (localCheckpoint, previous round unpersisted — the iterative-
    * DataFrame discipline of [[Dedup.duplicateClusters]]); the
    * sequential path keeps the lazy rewrite chain, measured faster at
    * its ≤64-merge scale than per-round materialization.
    */
  private def train(docs: DataFrame, merges: Int, batch: Int = 1)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 1 && merges <= 100000,
      "merges must be in [1, 100000]")
    require(batch >= 1 && batch <= 256, "batch must be in [1, 256]")
    require(batch > 1 || merges <= 64,
      "sequential training (batch=1) is one driver round-trip per " +
        "merge - cap 64; use batch > 1 for larger merge budgets")
    // the ONE corpus-sized pass: the word-count table is pinned once
    // (localCheckpoint — ContextCleaner reclaims the blocks when the
    // final plan's RDDs are collected); every round's symbol state is
    // derived from it.
    val words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true)
    var syms = words.select(col("word"), charSyms(col("word")).as("sym"),
      col("cnt"))
    var pinned: Option[DataFrame] = None
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      val pairs = syms
        .select(col("cnt"), split(col("sym"), " ", -1).as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(0), size(col("arr")) - 2)).as("i"), col("arr"))
        .select(col("cnt"), concat_ws(" ",
          element_at(col("arr"), col("i") + 1),
          element_at(col("arr"), col("i") + 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
      val top = pairs.orderBy(col("freq").desc, col("pair")).limit(batch)
        .collect() // ≤ batch rows per round, by construction
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = Seq.newBuilder[(String, String, Long)]
        var n = 0
        for (row <- top if step + n < merges) {
          val pair = row.getString(0)
          val freq = row.getLong(1)
          val Array(a, b) = pair.split(" ", 2)
          val merged = a + b
          if (!used.contains(a) && !used.contains(b) &&
              !used.contains(merged)) {
            accepted += ((pair, merged, freq))
            used ++= Seq(a, b, merged)
            n += 1
          }
        }
        for ((pair, merged, freq) <- accepted.result()) {
          step += 1
          out += ((step, pair, merged, freq))
          val pad = concat(lit(" "), col("sym"), lit(" "))
          val once = replace(pad, lit(s" $pair "), lit(s" $merged "))
          syms = syms.select(col("word"),
            trim(replace(once, lit(s" $pair "), lit(s" $merged "))).as("sym"),
            col("cnt"))
        }
        if (batch > 1) {
          val mat = syms.localCheckpoint(eager = true)
          pinned.foreach(_.unpersist())
          pinned = Some(mat)
          syms = mat
        }
      }
    }
    (out.result(), syms)
  }

  /** The learned merge table: (step, pair, merged, freq). `batch > 1`
    * accepts multiple non-interacting merges per driver round — see
    * [[train]] for the exact rule and when it equals sequential BPE.
    */
  def bpeMerges(docs: DataFrame, rounds: Int, batch: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) = train(docs, rounds, batch)
    merges.toDF("step", "pair", "merged", "freq")
  }

  /** Sampled-corpus BPE training — the standard answer to the
    * driver-round cost model at real vocabulary scale: even batched,
    * a 10⁵-merge vocabulary is ~merges/batch driver-synchronized
    * rounds over the full word table, while the merge TABLE a trainer
    * learns converges on a far smaller corpus sample (Zipf: pair
    * frequencies are dominated by high-frequency words that any
    * uniform sample retains). Train on a deterministic md5-ranked
    * reservoir (`hash60(doc_id) % 100 < pct` — the
    * [[graft.operators.Sampling]] membership rule, reproducible in
    * any engine, no RNG state), then validate on the FULL corpus:
    * [[bpeSegment]] with the sampled merge table measures realized
    * compression, and `BpeSpec` pins sampled-vs-full merge-table
    * agreement on the fixture corpus. Cost: the word-count pass
    * scans pct% of the corpus and every round's aggregate runs over
    * the sample's word table — at 100 TB with pct=1 the 400-round
    * 10⁵-merge schedule becomes 400 aggregates over ~1 TB of text's
    * word table, hours → minutes.
    */
  def bpeMergesSampled(docs: DataFrame, rounds: Int, batch: Int,
                       pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, "pct must be in [1, 100]")
    bpeMerges(
      docs.filter(hash60(col("doc_id").cast("string")) % 100 < pct),
      rounds, batch)
  }

  /** Per-document BPE compression report under the learned merges:
    * (doc_id, n_words, n_bpe) — the corpus-level check that a
    * tokenizer actually compresses (n_bpe starts at character count
    * and walks down toward n_words as rounds grow). The doc→word
    * explode joins the word→segmentation map on `word`; the map is the
    * distinct-word table, so Catalyst broadcasts it when it fits and
    * shuffle-joins otherwise.
    */
  def bpeSegment(docs: DataFrame, rounds: Int, batch: Int = 1): DataFrame = {
    val (_, syms) = train(docs, rounds, batch)
    val out = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(syms.select(col("word"),
        size(split(col("sym"), " ", -1)).cast("long").as("nb")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("nb")).as("n_bpe"))
    out
  }

  // ------------------------------------------------------------- oracle

  /** The shared DuckDB CTE chain: w0 (word counts), s0 (char symbols),
    * then per round r: p_r (pair counts), b_r (argmax pair), s_r
    * (rewritten symbols). Kept adjacent to the implementation so the
    * two unroll the same recurrence.
    */
  private def oracleCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents) GROUP BY word),\n")
    sb.append("s0 AS (SELECT word, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym, cnt FROM w0)")
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      sb.append(s""",
p$r AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
  SELECT cnt, unnest([arr[i+1] || ' ' || arr[i+2] for i in range(len(arr)-1)]) AS pair
  FROM (SELECT string_split(sym,' ') AS arr, cnt FROM $prev) WHERE len(arr) >= 2)
 GROUP BY pair),
b$r AS (SELECT pair, replace(pair, ' ', '') AS merged, freq FROM p$r ORDER BY freq DESC, pair LIMIT 1),
s$r AS (SELECT word, COALESCE(trim(replace(replace(' '||sym||' ', ' '||b$r.pair||' ', ' '||b$r.merged||' '), ' '||b$r.pair||' ', ' '||b$r.merged||' ')), sym) AS sym, cnt FROM $prev LEFT JOIN b$r ON TRUE)""")
    }
    sb.toString
  }

  /** DuckDB oracle for [[bpeMerges]]. */
  def oracleMerges(rounds: Int): String =
    oracleCtes(rounds) + "\n" +
      (1 to rounds)
        .map(r => s"SELECT $r AS step, pair, merged, freq FROM b$r")
        .mkString(" UNION ALL ")

  /** DuckDB oracle for BATCHED [[bpeMerges]] — mirrors the greedy
    * non-interacting selection exactly: per round, rank the top
    * `batch` pairs by (freq DESC, pair), then a linear recursive scan
    * keeps a pair iff none of {left sym, right sym, merged} collides
    * with the same set of any pair already kept this round (the
    * [[train]] rule); accepted merges apply in rank order via a
    * string fold. `merges` rounds are unrolled — each round accepts
    * ≥1 merge unless pairs are exhausted, so that is the worst case;
    * once the budget is spent the per-round slice `kept[1:remaining]`
    * degenerates to [] and the round is an identity.
    *
    * The greedy scan is a recursive CTE rather than a list_reduce
    * fold: DuckDB 1.0's list_reduce silently RESETS a list-typed
    * accumulator past ~6 elements when the lambda conditionally
    * returns it unchanged (reproduced in isolation); the
    * VARCHAR-accumulator fold used for merge application is
    * unaffected.
    */
  def oracleMergesBatched(merges: Int, batch: Int,
                          docsWhere: String = ""): String = {
    val sb = new StringBuilder
    sb.append(s"WITH RECURSIVE w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents $docsWhere) GROUP BY word),\n")
    sb.append("s0 AS (SELECT word, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym, cnt FROM w0)")
    for (r <- 1 to merges) {
      val prev = s"s${r - 1}"
      val off =
        if (r == 1) "0"
        else (1 until r).map(i => s"(SELECT COUNT(*) FROM b$i)").mkString(" + ")
      sb.append(s""",
p$r AS MATERIALIZED (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
  SELECT cnt, unnest([arr[i+1] || ' ' || arr[i+2] for i in range(len(arr)-1)]) AS pair
  FROM (SELECT string_split(sym,' ') AS arr, cnt FROM $prev) WHERE len(arr) >= 2)
 GROUP BY pair),
t$r AS MATERIALIZED (SELECT pair, ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS rn
  FROM (SELECT pair, freq FROM p$r ORDER BY freq DESC, pair LIMIT $batch)),
g$r AS (
  SELECT 0 AS rn, CAST([] AS VARCHAR[]) AS kept
  UNION ALL
  SELECT t.rn,
    CASE WHEN list_has_any(
        flatten(list_transform(g.kept, w -> list_append(string_split(w,' '), replace(w,' ','')))),
        list_append(string_split(t.pair,' '), replace(t.pair,' ','')))
      THEN g.kept ELSE list_append(g.kept, t.pair) END
  FROM g$r g JOIN t$r t ON t.rn = g.rn + 1),
k$r AS MATERIALIZED (SELECT kept[1:CAST($merges - ($off) AS INTEGER)] AS kept
  FROM g$r ORDER BY rn DESC LIMIT 1),
b$r AS MATERIALIZED (SELECT u.pair, replace(u.pair,' ','') AS merged, p.freq, u.ord
  FROM (SELECT unnest(kept) AS pair, generate_subscripts(kept,1) AS ord FROM k$r) u
  JOIN p$r p USING (pair)),
s$r AS MATERIALIZED (SELECT word, trim(list_reduce(list_prepend(' '||sym||' ', kept),
    (a, q) -> replace(replace(a, ' '||q||' ', ' '||replace(q,' ','')||' '),
                      ' '||q||' ', ' '||replace(q,' ','')||' '))) AS sym, cnt
  FROM $prev, k$r)""")
    }
    sb.append("\n")
    sb.append((1 to merges).map { r =>
      val off =
        if (r == 1) "0"
        else (1 until r).map(i => s"(SELECT COUNT(*) FROM b$i)").mkString(" + ")
      s"SELECT CAST(($off) + ord AS INTEGER) AS step, pair, merged, freq FROM b$r"
    }.mkString(" UNION ALL "))
    sb.toString
  }

  /** DuckDB oracle for [[bpeMergesSampled]]: the batched oracle over
    * the identical md5-ranked document sample.
    */
  def oracleMergesSampled(merges: Int, batch: Int, pct: Int): String =
    oracleMergesBatched(merges, batch,
      s"WHERE CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 100 < $pct")

  /** DuckDB oracle for [[bpeSegment]]. */
  def oracleSegment(rounds: Int): String =
    oracleCtes(rounds) + s""",
d AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(len(string_split(m.sym,' '))) AS BIGINT) AS n_bpe
FROM d JOIN s$rounds m USING (word) GROUP BY doc_id"""
}
