package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training + encoding (Kudo, ACL 2018 — the
  * SentencePiece unigram model), completing the learned-tokenizer
  * family beside [[Bpe]] (merge-based) and the WordPiece tier: seed a
  * candidate piece inventory from substring frequencies, run an EM
  * round (Viterbi E-step under current piece costs, usage-count
  * M-step), prune to the vocabulary budget, and encode every word by
  * its minimum-cost segmentation.
  *
  * Like [[Bpe]], everything runs over the distinct WORD-COUNT table —
  * Zipf's law makes it orders of magnitude smaller than the corpus,
  * and the one corpus-sized pass is the initial word count. The piece
  * inventory is bounded by construction (`seedTop` + alphabet), so the
  * model broadcasts; the Viterbi E-step is then a NARROW mapPartitions
  * over words with the broadcast cost table (the model-handle
  * exception to the no-UDF rule — the same shape as the codec tier),
  * and the M-step is one hash aggregate over the segmented pieces. At
  * 100 TB: corpus scan → ~10⁸-row word table → per-word O(len·L) DP —
  * no join ever touches the corpus again.
  *
  * Cross-engine exactness: piece costs are INTEGERS —
  * round(ln(total/cnt)·10⁶) — computed once per round, so every DP
  * comparison downstream is exact BIGINT arithmetic; ties break by the
  * stored path's UTF-8 byte order through the SAME stored-prefix
  * recurrence both engines evaluate (min-struct over (cost, path)),
  * making the chosen segmentation bit-identical. The only float in
  * the whole pipeline is the one ln() per piece per round, which
  * agrees across engines to ~1 ulp — a cost flips only if
  * ln·10⁶ sits within ~10⁻⁹ of a rounding boundary (the
  * [[TextAnalysis.tfidfTopTerms]] argument, made stronger by the
  * integer quantization).
  *
  * Simplifications vs Kudo 2018, documented like [[Bpe]]'s batched
  * merges: ONE EM round (the paper runs 2 per prune step), prune
  * straight to the budget by usage count (the paper ranks by
  * likelihood loss), and words longer than `maxWordLen` are excluded
  * from training/encoding (none exist in this corpus; a production
  * run raises the cap, which only lengthens the unrolled oracle).
  */
object Unigram {

  val MaxPieceLen = 4
  val MaxWordLen = 16
  val SeedTop = 512
  val VocabSize = 256
  val CostScale = 1000000L

  /** Distinct word counts, capped at [[MaxWordLen]] chars. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ", -1)).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))

  /** Seed piece counts: every substring of length 1..[[MaxPieceLen]]
    * of every word, weighted by word count; kept = global
    * top-[[SeedTop]] by (cnt DESC, piece) ∪ ALL single chars (the
    * coverage floor that keeps every word segmentable).
    */
  private def seedKept(words: DataFrame): DataFrame = {
    val sub = words.select(col("wcnt"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
         |  transform(sequence(1, least($MaxPieceLen, length(word) - i + 1)),
         |            j -> substring(word, i, j))))""".stripMargin))
      .as("piece"))
    val pcnt = sub.groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
      .localCheckpoint(eager = false)
    pcnt.orderBy(col("cnt").desc, col("piece")).limit(SeedTop)
      .unionByName(pcnt.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** round(ln(total/cnt)·10⁶) on the integer grid — the one float op. */
  private def intCost(total: Long, cnt: Long): Long =
    Math.round(Math.log(total.toDouble / cnt.toDouble) * CostScale)

  /** a <ᵤₜ𝒻₈ b — the byte order both SQL engines use for strings. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Viterbi min-cost segmentation — EXACTLY the stored-prefix
    * struct-min recurrence the unrolled oracle evaluates: v(0) =
    * (0, ""); v(p) = min over j≤[[MaxPieceLen]] of
    * (v(p−j).cost + cost(piece), v(p−j).path ⧺ ' ' ⧺ piece),
    * minimum by (cost, path UTF-8 bytes).
    */
  private[graft] def viterbi(word: String,
                             costs: Map[String, Long]): (Long, String) = {
    val n = word.length
    val vc = new Array[Long](n + 1)
    val vp = new Array[String](n + 1)
    vp(0) = ""
    var p = 1
    while (p <= n) {
      var bc = Long.MaxValue
      var bp: String = null
      var j = 1
      while (j <= Math.min(MaxPieceLen, p)) {
        val piece = word.substring(p - j, p)
        costs.get(piece) match {
          case Some(c) if vp(p - j) != null =>
            val cand = vc(p - j) + c
            val candPath = vp(p - j) + " " + piece
            if (cand < bc || (cand == bc && utf8Lt(candPath, bp)))  {
              bc = cand; bp = candPath
            }
          case _ =>
        }
        j += 1
      }
      vc(p) = bc; vp(p) = bp
      p += 1
    }
    (vc(n), vp(n))
  }

  /** (word, wcnt) → (word, wcnt, cost, path) via [[viterbi]] with the
    * broadcast cost table — a narrow map, no shuffle.
    */
  private def segment(words: DataFrame,
                      costs: Map[String, Long]): DataFrame = {
    import words.sparkSession.implicits._
    val bc = words.sparkSession.sparkContext.broadcast(costs)
    words.select(col("word"), col("wcnt")).as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (w, c) =>
          val (cost, path) = viterbi(w, m)
          (w, c, cost, path)
        }
      }.toDF("word", "wcnt", "cost", "path")
  }

  /** Seed → EM round → pruned model, as (words frame, model rows).
    * The collects are bounded by construction: `kept` ≤ [[SeedTop]] +
    * alphabet rows, `usage` ⊆ kept — never words, never the corpus.
    */
  private def trained(docs: DataFrame): (DataFrame, Array[(String, Long, Long)]) = {
    val words = wordCounts(docs).localCheckpoint(eager = false)
    val kept = seedKept(words).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = kept.map(_._2).sum
    val c0 = kept.map { case (p, c) => p -> intCost(total, c) }.toMap
    // E-step: optimal segmentation of every word under seed costs;
    // M-step: piece usage weighted by word count
    val usage = segment(words, c0)
      .select(explode(split(ltrim(col("path")), " ")).as("piece"),
        col("wcnt"))
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (words, finalModel(kept, usage))
  }

  /** The trained model: (piece, cnt, cost) after seed → one EM round
    * → prune to [[VocabSize]] (single chars always survive, usage
    * floored at 1 so their cost stays finite).
    */
  def train(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trained(docs)._2.toSeq.toDF("piece", "cnt", "cost")
  }

  /** Prune + final costs (driver-side over the ≤ seed-sized piece
    * list): rank seed pieces by usage (DESC, then piece), keep the
    * top [[VocabSize]] with usage > 0 plus every single char.
    */
  private def finalModel(kept: Array[(String, Long)],
                         usage: Map[String, Long]): Array[(String, Long, Long)] = {
    val ranked = kept.map { case (p, _) => (p, usage.getOrElse(p, 0L)) }
      .sortWith { case ((pa, ca), (pb, cb)) =>
        ca > cb || (ca == cb && utf8Lt(pa, pb)) }
      .zipWithIndex
    val fin = ranked.collect {
      case ((p, c), rn) if (rn < VocabSize && c > 0) || p.length == 1 =>
        (p, if (p.length == 1) Math.max(c, 1L) else c)
    }
    val total2 = fin.map(_._2).sum
    fin.map { case (p, c) => (p, c, intCost(total2, c)) }
      .sortBy(_._1)
  }

  /** Per-word encoding under the trained model: (word, wcnt, pieces,
    * n_pieces, cost).
    */
  def encode(docs: DataFrame): DataFrame = {
    val (words, model) = trained(docs)
    val c1 = model.map { case (p, _, c) => p -> c }.toMap
    segment(words, c1)
      .select(col("word"), col("wcnt"),
        ltrim(col("path")).as("pieces"),
        size(split(ltrim(col("path")), " ")).cast("long").as("n_pieces"),
        col("cost"))
  }
}
