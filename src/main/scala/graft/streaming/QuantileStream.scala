package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ε-approximate quantiles per source — a GREENWALD–KHANNA
  * summary (Greenwald & Khanna, SIGMOD 2001) held in
  * `flatMapGroupsWithState`: a sorted list of (value, g, Δ) tuples
  * where g is the rank mass the tuple absorbed and Δ bounds its rank
  * uncertainty. The maintained invariant is the paper's correctness
  * condition g_i + Δ_i ≤ ⌊2εn⌋ (inserts enter with
  * Δ = max(0, ⌊2εn⌋ − 1); a merge of i into i+1 happens only while
  * g_i + g_{i+1} + Δ_{i+1} ≤ ⌊2εn⌋), which makes every quantile
  * query ε-accurate IN RANK: the returned value's true rank is
  * within εn of ⌈φn⌉, after any number of micro-batches
  * (`QuantileStreamSpec` measures the bound against exact sorted
  * data). Below n < 1/(2ε) the summary degenerates to exact order
  * statistics — Δ floors at 0 and no merge fires.
  *
  * This uses the simplified merge rule rather than the paper's
  * band/tree compress: the invariant (and so the guarantee) is
  * identical; only the space constant is looser — still
  * O((1/ε)·log(εn)) in practice, and the spec pins the summary two
  * decades under the stream length it digested.
  *
  * Scale: state is the tuple list per source — size bounded by the
  * compress invariant, never the stream; sources parallelize across
  * the cluster (one shuffle on the source key); per-value cost is
  * one ordered insertion + amortized compress. This is the
  * streaming complement to the exact batch percentile tier
  * (`o10_daily_percentiles`): the same deciles, constant state,
  * unbounded stream.
  */
object QuantileStream {

  final case class Obs(source: String, value: Double)

  final case class GKTuple(v: Double, g: Long, delta: Long)

  final case class GKState(n: Long, tuples: List[GKTuple])

  /** One emitted decile: the summary's answer at φ with its running
    * count, summary size, and the rank-error budget εn it promises.
    */
  final case class Quant(source: String, phi: Double, q: Double,
                         n_seen: Long, n_tuples: Int, max_rank_err: Long)

  val Phis: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** ⌊2εn⌋ — the per-tuple rank-uncertainty cap at stream length n. */
  private def cap(n: Long, eps: Double): Long = (2.0 * eps * n).toLong

  /** Ordered insert of one value, Δ-capped per the invariant.
    * New extremes (head/tail position) enter exact (Δ = 0), as the
    * paper requires — min and max are always recoverable.
    */
  private def insert(st: GKState, v: Double, eps: Double): GKState = {
    // a NaN compares false against everything, silently corrupting the
    // sorted invariant — fail loud, the caller filters or fixes
    require(!v.isNaN, "GK summary is undefined over NaN values")
    val n = st.n + 1
    val (before, after) = st.tuples.span(_.v <= v)
    val delta =
      if (before.isEmpty || after.isEmpty) 0L
      else math.max(0L, cap(st.n, eps) - 1L)
    GKState(n, before ::: GKTuple(v, 1L, delta) :: after)
  }

  /** One compress sweep: fold right-to-left, merging tuple i into its
    * right neighbor while the combined mass stays under ⌊2εn⌋. The
    * first and last tuples never merge away (extremes stay exact).
    */
  private def compress(st: GKState, eps: Double): GKState = {
    val limit = cap(st.n, eps)
    st.tuples match {
      case head :: rest if rest.nonEmpty =>
        val merged = rest.foldRight(List.empty[GKTuple]) { (t, acc) =>
          acc match {
            case r :: tail if tail.nonEmpty && t.g + r.g + r.delta <= limit =>
              r.copy(g = t.g + r.g) :: tail
            case _ => t :: acc
          }
        }
        GKState(st.n, head :: merged)
      case _ => st
    }
  }

  /** Quantile at φ: with r = ⌈φn⌉ and e = εn, return the value of
    * the tuple preceding the first whose rmax exceeds r + e — the
    * paper's query rule; its true rank lies in [r − e, r + e].
    */
  def query(st: GKState, phi: Double, eps: Double): Double = {
    val r = math.ceil(phi * st.n).toLong
    val e = (eps * st.n).toLong
    @annotation.tailrec
    def go(ts: List[GKTuple], rmin: Long, prev: Double): Double = ts match {
      case t :: tail =>
        if (rmin + t.g + t.delta > r + e) prev
        else go(tail, rmin + t.g, t.v)
      case Nil => prev
    }
    go(st.tuples, 0L, st.tuples.head.v)
  }

  def stateFn(eps: Double)(source: String, obs: Iterator[Obs],
                           state: GroupState[GKState]): Iterator[Quant] = {
    var st = state.getOption.getOrElse(GKState(0L, Nil))
    var sinceCompress = 0
    val period = math.max(1, (1.0 / (2.0 * eps)).toInt)
    obs.foreach { o =>
      st = insert(st, o.value, eps)
      sinceCompress += 1
      if (sinceCompress >= period) {
        st = compress(st, eps)
        sinceCompress = 0
      }
    }
    st = compress(st, eps)
    state.update(st)
    if (st.n == 0L) Iterator.empty
    else Phis.map { phi =>
      Quant(source, phi, query(st, phi, eps), st.n, st.tuples.size,
        (eps * st.n).toLong)
    }.iterator
  }

  /** observations → update-mode stream of the current per-source
    * deciles (every trigger re-emits the five φ rows with the running
    * n; the newest n_seen per source is the current summary).
    */
  def deciles(obs: Dataset[Obs], eps: Double): Dataset[Quant] = {
    require(eps > 0.0 && eps < 0.5, "eps in (0, 0.5)")
    implicit val qEnc = Encoders.product[Quant]
    implicit val stEnc = Encoders.product[GKState]
    implicit val strEnc = Encoders.STRING
    obs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(stateFn(eps))
  }
}
