package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming IVF cell monitor — the index-maintenance stream behind
  * the at-rest vector layout (`Similarity.ivfWriteAtRest`): arriving
  * vectors are assigned to their cell MAP-SIDE by the same argmax-dot
  * rule as every batch IVF operator (max dot product against the
  * inlined centroid literals, ties to the smallest centroid id, the
  * dot a left-to-right fold — bit-identical to the Column form in
  * `graft.functions.VectorFunctions.dot`, so the streaming assignment
  * and the batch assignment of the same vector NEVER disagree:
  * `IvfStreamSpec` pins count-table equality with
  * `Similarity.ivfCellBalance`). Per-cell running counts accumulate
  * in `flatMapGroupsWithState`; every trigger re-emits each touched
  * cell's count, so the consumer always has the live load histogram —
  * the signal that says WHEN the at-rest layout needs re-clustering
  * (a hot cell = a hot partition = a slow probe) without ever
  * re-scanning the corpus.
  *
  * Scale: state is ONE long per cell (k cells total, k ≤ 4096 by the
  * anchor rule); cells parallelize across the cluster (the stream
  * shuffles once on the cell id, which is also the at-rest partition
  * key — the monitor shuffle mirrors the write shuffle); per-vector
  * cost is k dot products, the same map-side projection the batch
  * path pays.
  */
object IvfStream {

  final case class Vec(vec_id: Long, embedding: Seq[Double])

  final case class CellCount(cell: Int, n_vecs: Long)

  /** Batch-identical cell assignment: argmax dot, ties to smallest
    * centroid id, dot as the left-to-right fold. Comparison is
    * `java.lang.Double.compare` — the SAME total order Spark's
    * `array_sort` applies (−0.0 < 0.0, NaN greatest), so even a NaN
    * or signed-zero dot cannot make the stream and the batch path
    * pick different cells.
    */
  def assign(v: Seq[Double], cent: Seq[(Int, Array[Double])]): Int = {
    require(cent.nonEmpty, "IVF needs centroids")
    var bestId = Int.MaxValue
    var bestNeg = Double.NaN
    var first = true
    cent.foreach { case (id, cv) =>
      require(v.length == cv.length,
        s"vector dim ${v.length} != centroid $id dim ${cv.length}")
      var s = 0.0
      var i = 0
      val n = v.length
      while (i < n) { s += v(i) * cv(i); i += 1 }
      val neg = -s
      val c = java.lang.Double.compare(neg, bestNeg)
      if (first || c < 0 || (c == 0 && id < bestId)) {
        bestNeg = neg
        bestId = id
        first = false
      }
    }
    bestId
  }

  private def stateFn(cell: Int, vecs: Iterator[Vec],
                      state: GroupState[Long]): Iterator[CellCount] = {
    val n = state.getOption.getOrElse(0L) + vecs.size
    state.update(n)
    Iterator.single(CellCount(cell, n))
  }

  /** vectors → update-mode stream of per-cell running counts (the
    * newest row per cell is the live histogram entry).
    */
  def cellCounts(vecs: Dataset[Vec],
                 cent: Seq[(Int, Array[Double])]): Dataset[CellCount] = {
    implicit val ccEnc = Encoders.product[CellCount]
    implicit val longEnc = Encoders.scalaLong
    implicit val intEnc = Encoders.scalaInt
    vecs
      .groupByKey(v => assign(v.embedding, cent))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(stateFn)
  }

  /** One rebuild recommendation per trigger: live corpus size,
    * the entry-cell count THAT size wants, and whether to rebuild.
    */
  final case class RebuildSignal(corpus_n: Long, built_n: Long,
                                 built_cells: Int, auto_cells: Int,
                                 rebuild: Boolean)

  /** Corpus-growth drift monitor — the rebuild TRIGGER for the at-rest
    * index tier: the batch layouts derive their entry-cell budget from
    * the corpus ([[graft.operators.Similarity.autoCellsOf]], ⌈√n⌉
    * clamped), so on material growth the signal must say not just
    * "rebuild" but "rebuild AT THE NEW CELL COUNT" — a rebuild at the
    * stale count re-creates the fixed-budget recall decay the √n rule
    * exists to prevent. `builtN` is the corpus size the serving layout
    * was built at (stored in the layout's meta relation by
    * [[graft.operators.Similarity.graphWriteAtRest]]); arriving
    * vectors accrete a single running count, and the recommendation
    * fires once corpus_n ≥ `factor`·built_n (default 2 — a corpus
    * doubling halves per-cell entry coverage at the stale budget).
    * The recommended `auto_cells` feeds
    * [[graft.operators.Similarity.graphPublishVersion]]: rebuild at
    * the new count, publish, serving rotates atomically
    * ([[GraphServeStream.startVersioned]]).
    *
    * Scale: state is ONE long (the arrival count); per-trigger output
    * is one row. The single group key is deliberate — this is a
    * monitor emitting a scalar recommendation, not a data path.
    */
  def rebuildSignal(vecs: Dataset[Vec], builtN: Long, builtCells: Int,
                    factor: Double = 2.0): Dataset[RebuildSignal] = {
    require(builtN >= 0 && builtCells >= 1 && factor > 1.0,
      "built size, built cells, and a growth factor > 1")
    implicit val rsEnc = Encoders.product[RebuildSignal]
    implicit val longEnc = Encoders.scalaLong
    implicit val intEnc = Encoders.scalaInt
    def fn(key: Int, batch: Iterator[Vec],
           state: GroupState[Long]): Iterator[RebuildSignal] = {
      val arrived = state.getOption.getOrElse(0L) + batch.size
      state.update(arrived)
      val n = builtN + arrived
      Iterator.single(RebuildSignal(n, builtN, builtCells,
        graft.operators.Similarity.autoCellsOf(n),
        n >= math.ceil(factor * builtN).toLong))
    }
    vecs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
