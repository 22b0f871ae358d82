package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain (src, dst) edge lists — the
  * crawl-curation signal tier: link-graph authority scores feed domain
  * prioritization and quality weighting in a web-scale pipeline.
  */
object Graphs {

  /** Integerized PageRank: damping-0.85 power iteration over ranks
    * held as INTEGERS on a `scale` grid, with floor division at every
    * step — so any two engines, partitionings, or cluster sizes
    * produce bit-identical ranks (a float PageRank's per-node sums
    * reorder across partitions and drift in the low bits; this is the
    * deterministic form of the same fixpoint, accurate to 1/scale).
    *
    * rank⁰ = scale/N;  rankᵗ⁺¹(v) = (0.15·scale)/N +
    * (85 · Σ_{u→v} rankᵗ(u) div deg(u)) div 100 — every division a
    * floor.
    *
    * Scale shape: each iteration is one edges⨝ranks hash join on src
    * (edges are hash-partitioned once and that partitioning REUSES
    * across iterations), a dst-keyed partial+final sum, and a
    * node-keyed left join; per-iteration lineage is truncated with a
    * lazy localCheckpoint (the [[Dedup.duplicateClusters]] pattern —
    * without it the plan doubles every round). Driver state is two
    * scalars (N, teleport).
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    // an empty edge set has no nodes: return an empty (node, rank)
    // frame instead of dividing by zero in the teleport term
    if (n == 0)
      return nodes.select(col("node"), lit(scale).as("rank"))
    val teleport = (scale * 15L / 100L) / n
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("inr"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(inr, 0)) div 100"))
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
