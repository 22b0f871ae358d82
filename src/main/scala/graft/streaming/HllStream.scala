package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HyperLogLog per group — the UNBOUNDED-stream twin of
  * `Reports.dailyUniqueHll`, and deliberately BIT-COMPATIBLE with it:
  * the same md5-derived hash60 (hex prefix, like the batch SQL's
  * `conv(substring(md5(x),1,15),16,10)`), the same register split
  * (index = low 8 bits, rho = leading zeros of the 52-bit remainder
  * + 1), the same exact-BIGINT harmonic sum, and the same fixed-order
  * float finish — so a streaming estimate and the batch estimate over
  * the same elements agree to the last bit of the register table
  * (`HllStreamSpec` pins the agreement). A stream split across any
  * number of micro-batches converges to the identical state because
  * register max is order- and batching-invariant — the mergeability
  * that makes HLL the distinct-count sketch shards and streams share.
  *
  * Scale: state is ≤ 256 register bytes (here a small Map) + one
  * count per group, at ANY cardinality; groups parallelize across
  * the cluster (one shuffle on the group key); per-item cost is one
  * md5 + a map update.
  */
object HllStream {

  final case class Item(group: String, item: String)

  final case class HllState(n: Long, regs: Map[Int, Int])

  final case class HllEst(group: String, n_seen: Long, n_regs: Int,
                          v_zero: Long, hll_est: Double)

  val P = 8
  val M: Int = 1 << P
  private val Two53 = 9007199254740992L // 2^53
  private val Alpha = 0.7213 / (1.0 + 1.079 / M.toDouble)
  private val Numer = Alpha * M.toDouble * M.toDouble * Two53.toDouble

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The shared 60-bit md5 hash (JVM mirror of the SQL hash60): the
    * first 15 hex nibbles = the top 7½ digest bytes, assembled by
    * bit arithmetic — no hex-string round trip on the per-item hot
    * path, one digest instance per thread. Bit-identical to
    * `parseLong(hexString.take(15), 16)`.
    */
  def hash60(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** (register index, rho): low P bits index; rho = leading zeros of
    * the remaining 52-bit field + 1 (all-zero remainder → 53).
    */
  def registerOf(item: String): (Int, Int) = {
    val h = hash60(item)
    val idx = (h % M).toInt
    val rem = h / M
    val rho = if (rem == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (idx, rho)
  }

  /** The estimate from a register table — the IDENTICAL arithmetic
    * the batch operator and its DuckDB oracle run: exact BIGINT
    * Σ 2^(53−M_j) with empty registers at 2^53, then one constant
    * divide, with the linear-counting branch below 2.5m.
    */
  def estimate(regs: Map[Int, Int]): Double = {
    val vZero = (M - regs.size).toLong
    val zScaled = regs.values.map(mj => 1L << (53 - mj)).sum +
      vZero * Two53
    val raw = Numer / zScaled.toDouble
    if (raw <= 2.5 * M && vZero > 0L)
      M.toDouble * math.log(M.toDouble / vZero.toDouble)
    else raw
  }

  /** Register-table merge — THE HLL property: max per register, so
    * shards/streams/days combine without ever re-reading elements,
    * and estimate(merge(a, b)) equals the single-pass estimate over
    * the union (`HllStreamSpec` pins it). Commutative, associative,
    * idempotent.
    */
  def merge(a: Map[Int, Int], b: Map[Int, Int]): Map[Int, Int] =
    (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap

  def stateFn(group: String, items: Iterator[Item],
              state: GroupState[HllState]): Iterator[HllEst] = {
    val st = state.getOption.getOrElse(HllState(0L, Map.empty))
    var n = st.n
    val regs = scala.collection.mutable.HashMap[Int, Int](st.regs.toSeq: _*)
    items.foreach { it =>
      n += 1L
      val (idx, rho) = registerOf(it.item)
      if (regs.getOrElse(idx, 0) < rho) regs(idx) = rho
    }
    val snap = regs.toMap
    state.update(HllState(n, snap))
    Iterator.single(HllEst(group, n, snap.size, (M - snap.size).toLong,
      estimate(snap)))
  }

  /** items → update-mode stream of the current per-group estimate
    * (every trigger re-emits; the newest n_seen per group is the
    * current summary).
    */
  def estimates(items: Dataset[Item]): Dataset[HllEst] = {
    implicit val eEnc = Encoders.product[HllEst]
    implicit val stEnc = Encoders.product[HllState]
    implicit val strEnc = Encoders.STRING
    items
      .filter((i: Item) => i.item != null) // COUNT(DISTINCT) semantics
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(stateFn)
  }
}
