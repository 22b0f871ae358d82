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

  /** (word, sym, cnt) after `rounds` BPE merges, plus the merge list.
    * The returned frames: merges = (round, pair, merged, freq);
    * syms = the segmentation map (word → final space-joined symbols).
    */
  private def train(docs: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    // the ONE materialization: the word-count table is pinned once
    // (localCheckpoint — ContextCleaner reclaims the blocks when the
    // final plan's RDDs are collected) and every round's symbol state
    // is a lazy chain of narrow string rewrites on top of it. Each
    // round then runs exactly ONE job (the pair-count argmax); re-
    // deriving r rewrites per round is cheap codegen string work on
    // the small cached table, measured faster than materializing every
    // round's symbols just to truncate the chain.
    val words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true)
    var syms = words.select(col("word"), charSyms(col("word")).as("sym"),
      col("cnt"))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = syms
        .select(col("cnt"), split(col("sym"), " ", -1).as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(0), size(col("arr")) - 2)).as("i"), col("arr"))
        .select(col("cnt"), concat_ws(" ",
          element_at(col("arr"), col("i") + 1),
          element_at(col("arr"), col("i") + 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
      val best = pairs.orderBy(col("freq").desc, col("pair")).limit(1)
        .collect() // exactly one row per round, by construction
      if (best.nonEmpty) {
        val pair = best(0).getString(0)
        val freq = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, freq))
        val pad = concat(lit(" "), col("sym"), lit(" "))
        val once = replace(pad, lit(s" $pair "), lit(s" $merged "))
        syms = syms.select(col("word"),
          trim(replace(once, lit(s" $pair "), lit(s" $merged "))).as("sym"),
          col("cnt"))
      }
    }
    (merges.result(), syms)
  }

  /** The learned merge table: (step, pair, merged, freq). */
  def bpeMerges(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) = train(docs, rounds)
    merges.toDF("step", "pair", "merged", "freq")
  }

  /** Per-document BPE compression report under the learned merges:
    * (doc_id, n_words, n_bpe) — the corpus-level check that a
    * tokenizer actually compresses (n_bpe starts at character count
    * and walks down toward n_words as rounds grow). The doc→word
    * explode joins the word→segmentation map on `word`; the map is the
    * distinct-word table, so Catalyst broadcasts it when it fits and
    * shuffle-joins otherwise.
    */
  def bpeSegment(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, syms) = train(docs, rounds)
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
s$r AS (SELECT word, trim(replace(replace(' '||sym||' ', ' '||b$r.pair||' ', ' '||b$r.merged||' '), ' '||b$r.pair||' ', ' '||b$r.merged||' ')) AS sym, cnt FROM $prev, b$r)""")
    }
    sb.toString
  }

  /** DuckDB oracle for [[bpeMerges]]. */
  def oracleMerges(rounds: Int): String =
    oracleCtes(rounds) + "\n" +
      (1 to rounds)
        .map(r => s"SELECT $r AS step, pair, merged, freq FROM b$r")
        .mkString(" UNION ALL ")

  /** DuckDB oracle for [[bpeSegment]]. */
  def oracleSegment(rounds: Int): String =
    oracleCtes(rounds) + s""",
d AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(len(string_split(m.sym,' '))) AS BIGINT) AS n_bpe
FROM d JOIN s$rounds m USING (word) GROUP BY doc_id"""
}
