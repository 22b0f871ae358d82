package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per source — a MISRA–GRIES k-counter
  * summary (Misra & Gries, Sci. Comp. Prog. 1982) held in
  * `flatMapGroupsWithState`, in the mergeable form of Agarwal et al.
  * (PODS 2012): each micro-batch folds its tokens into at most `k`
  * counters per source, running one decrement round whenever a new
  * token finds the summary full. The classic guarantee survives any
  * number of micro-batches: for every token,
  * `est ≤ true ≤ est + max_err` with `max_err ≤ n_seen/(k+1)` — so
  * any token whose true frequency exceeds n/(k+1) is GUARANTEED
  * present, with bounded undercount, in O(k) state per source after
  * unbounded stream (`HeavyHittersStreamSpec` measures the bound
  * against exact counts).
  *
  * Scale: state is ≤ k counters plus two longs per source — never
  * tokens, never a batch; sources parallelize across the cluster
  * (the stream shuffles once on the source key); per-token cost is
  * O(1) amortized, because a decrement round charges its O(k) work
  * to the ≥ k+1 arrivals it absorbs. Emitted rows carry
  * (est, n_seen, max_err) so a consumer applies the φ-support cut
  * without a second pass — the streaming complement to the exact
  * batch `text_vocab_topk` tier.
  */
object HeavyHittersStream {

  final case class Tok(source: String, token: String)

  /** n = tokens seen; dec = decrement rounds run (the per-token
    * undercount bound); counts = the ≤ k live counters.
    */
  final case class HHState(n: Long, dec: Long, counts: Map[String, Long])

  final case class HH(source: String, token: String, est: Long,
                      n_seen: Long, max_err: Long)

  def stateFn(k: Int)(source: String, toks: Iterator[Tok],
                      state: GroupState[HHState]): Iterator[HH] = {
    val st = state.getOption.getOrElse(HHState(0L, 0L, Map.empty))
    val m = scala.collection.mutable.HashMap[String, Long](st.counts.toSeq: _*)
    var n = st.n
    var dec = st.dec
    toks.foreach { t =>
      n += 1L
      m.get(t.token) match {
        case Some(c) => m(t.token) = c + 1L
        case None if m.size < k => m(t.token) = 1L
        case None =>
          // summary full: the arriving token's implicit 1 cancels
          // against decrementing every live counter — one Misra–Gries
          // eviction round, zeroed counters leave the summary
          dec += 1L
          m.keys.toList.foreach { key =>
            val c = m(key) - 1L
            if (c == 0L) m.remove(key) else m(key) = c
          }
      }
    }
    state.update(HHState(n, dec, m.toMap))
    m.toSeq.sortBy { case (tok, c) => (-c, tok) }
      .map { case (tok, c) => HH(source, tok, c, n, dec) }
      .iterator
  }

  /** tokens → update-mode stream of the current per-source summary
    * (every trigger re-emits the ≤ k live counters with the running
    * n and error bound; the newest n_seen per source is the current
    * summary).
    */
  def summaries(toks: Dataset[Tok], k: Int): Dataset[HH] = {
    implicit val hhEnc = Encoders.product[HH]
    implicit val stEnc = Encoders.product[HHState]
    implicit val strEnc = Encoders.STRING
    toks
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(stateFn(k))
  }
}
