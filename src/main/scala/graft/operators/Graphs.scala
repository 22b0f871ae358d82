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

  /** Weighted PageRank: rank mass leaves each node PROPORTIONALLY to
    * edge weight (here typically the event multiplicity a raw log
    * witnesses — the repeat-link signal plain [[pageRank]]'s distinct
    * edge set throws away). Same integer grid and floor division:
    * rankᵗ⁺¹(v) = teleport + (85 · Σ_{u→v} (rankᵗ(u)·w(u,v)) div
    * wdeg(u)) div 100, with w summed per (src, dst) and wdeg the
    * node's total out-weight — bit-identical across engines and
    * partitionings. Products stay ≤ scale·w, far inside BIGINT for
    * any real log.
    *
    * Scale shape: identical to [[pageRank]] — the weight aggregate
    * replaces the distinct, and the per-iteration join reuses the
    * edge partitioning; per-iteration lazy localCheckpoint lineage
    * truncation (the small-relation discipline: the node universe
    * here is bounded, not corpus-sized).
    */
  def pageRankWeighted(edges: DataFrame, iters: Int,
                       scale: Long = 1000000L): DataFrame = {
    // Fail loud on null/zero/negative weights (the seeds discipline of
    // personalizedPageRank): a bad weight would make wdeg null or zero
    // and `rank div wdeg` propagate silent null ranks. The check rides
    // the weight projection INSIDE the first aggregate pass — a bad
    // row throws from raise_error when the per-(src,dst) sum first
    // scans it, so the clean path pays zero extra jobs (the eager
    // pre-count this replaces scanned edges once per call even when
    // every weight was fine).
    val checkedW = when(col("weight").isNotNull && col("weight") > 0,
        col("weight"))
      .otherwise(raise_error(
        lit("pageRankWeighted requires strictly positive non-null weights")))
    val e = edges.select(col("src"), col("dst"),
        checkedW.as("weight"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("w"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("node"), lit(scale).as("rank"))
    val teleport = (scale * 15L / 100L) / n
    val wdeg = e.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(wdeg, "src")
        .select(col("dst").as("node"),
          expr("(rank * w) div wdeg").as("c"))
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

  /** Personalized (seed-restricted) PageRank — the TrustRank shape
    * (Gyöngyi et al., VLDB 2004): teleport mass returns ONLY to the
    * seed set, so authority diffuses outward from trusted nodes
    * instead of spreading uniformly; the score ranks "how reachable
    * from the seeds" — the crawl-frontier prioritization signal.
    * Same integerized floor-division arithmetic as [[pageRank]]
    * (bit-identical across engines and partitionings): seeds start
    * with scale div |S| each, others 0;
    * rankᵗ⁺¹(v) = [v∈S]·((15·scale div 100) div |S|) +
    * (85 · Σ_{u→v} rankᵗ(u) div deg(u)) div 100.
    * |S| is the literal seed-list size; seeds absent from the graph
    * simply contribute nothing (documented, mirrored in the oracle).
    *
    * Scale shape: identical to [[pageRank]] — one edges⨝ranks join
    * per iteration reusing the edge partitioning, a dst-keyed sum,
    * per-iteration lazy localCheckpoint. The seed membership test is
    * an inlined literal `isin` — no extra join.
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[String],
                           iters: Int,
                           scale: Long = 1000000L): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs seeds")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val s = seeds.length.toLong
    val teleport = (scale * 15L / 100L) / s
    val seedMass = when(col("node").isin(seeds: _*), lit(teleport))
      .otherwise(lit(0L))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("node"),
      when(col("node").isin(seeds: _*), lit(scale / s))
        .otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("inr"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (seedMass + expr("(85 * coalesce(inr, 0)) div 100")).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Degree-distribution report: node counts per power-of-two degree
    * class with the class's min/max degree — the skew survey a graph
    * job runs BEFORE picking strategies (a power-law corpus whose top
    * class holds million-degree hubs needs the orientation/salting
    * discipline; a flat one doesn't). One degree aggregate and one
    * tiny class rollup; the log₂ class is the exact integer
    * bin-length idiom, so counts match any engine bit-for-bit.
    */
  def degreeStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .groupBy((length(bin(col("deg"))) - 1).cast("long").as("deg_class"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy(col("deg_class"))
  }

  /** Distributed triangle count with DEGREE-BASED edge orientation
    * (the node-iterator++ / compact-forward algorithm): every
    * undirected edge points from its lower-(degree, id) endpoint to
    * the higher, making the graph a DAG in which each triangle has
    * exactly one node with both out-edges — so wedges (two out-edges
    * of one node) joined against the closing oriented edge count every
    * triangle exactly once. Orienting by DEGREE first is the skew
    * discipline that makes this survive power-law graphs at 100 TB: a
    * hub's out-degree in the oriented graph is O(√m) regardless of its
    * raw degree, so the wedge join's per-key fanout — the quadratic
    * term — is bounded; id-only orientation would leave a
    * billion-follower hub with a billion out-edges and a 10¹⁸-row
    * wedge explosion.
    *
    * Shape: canonical-edge distinct, one degree aggregate joined to
    * both endpoints, the wedge self-join on the apex node, and a hash
    * semi-join against the closing edge — no cartesian products, no
    * sorts. Returns one row: (n_edges, n_wedges, n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // canonical undirected edge set (a < b by id, self-loops dropped)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false) // feeds degree + 3 join sides
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient: u -> v iff (deg_u, u) < (deg_v, v); struct fields share
    // names so the lexicographic comparison typechecks
    val ka = struct(col("da").as("d"), col("a").as("n"))
    val kb = struct(col("db").as("d"), col("b").as("n"))
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("u"),
        when(ka < kb, col("b")).otherwise(col("a")).as("v"),
        when(ka < kb, kb).otherwise(ka).as("vkey"))
      .localCheckpoint(eager = false) // feeds both wedge sides + close
    val wedges = o.select(col("u"), col("v").as("w1"), col("vkey").as("k1"))
      .join(o.select(col("u"), col("v").as("w2"), col("vkey").as("k2")), "u")
      .filter(col("k1") < col("k2"))
    // one traversal counts wedges AND closed wedges: the closing edge
    // rides a left join (oriented edges are unique, so no fanout) and
    // a conditional count — materializing the wedge join twice for two
    // separate aggregates would double the dominant cost
    val counts = wedges.join(
        o.select(col("u").as("w1"), col("v").as("w2"), lit(1).as("closed")),
        Seq("w1", "w2"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("closed")).as("n_triangles"))
    und.agg(count(lit(1)).as("n_edges")).crossJoin(counts)
  }

  /** Directed reciprocity: the fraction of distinct directed edges
    * whose reverse also exists — near 1 on conversational/social
    * graphs, near 0 on broadcast or citation structures; the single
    * number that says which regime a link graph is in before
    * choosing between symmetric and directed algorithms.
    *
    * Scale shape: one distinct, one self-left-semi-join on the
    * swapped key, two counts — everything keyed on the edge, nothing
    * quadratic.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val mutual = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("n_edges")).crossJoin(
        mutual.agg(count(lit(1)).as("n_mutual")))
      .select(col("n_edges"), col("n_mutual"),
        (col("n_mutual").cast("double") / col("n_edges").cast("double"))
          .as("reciprocity"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over every undirected edge counted in both
    * directions — positive means hubs link hubs (social graphs),
    * negative means hubs link leaves (the web, most event graphs).
    * ALL sums are exact BIGINTs (degrees are integers), so the only
    * float op is the final closed-form division — combine order
    * cannot move the answer at any scale.
    *
    * Scale shape: the canonical edge set, a degree aggregate, two
    * node-keyed joins to attach endpoint degrees, one 5-sum
    * aggregate. Nothing quadratic, no windows.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val paired = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("da").as("x"), col("db").as("y"))
    val sym = paired.unionByName(
      paired.select(col("y").as("x"), col("x").as("y")))
    sym.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("assortativity"))
  }

  /** k-core of the undirected graph (Seidman 1983): the maximal
    * subgraph in which every node has degree ≥ k, computed by the
    * standard peel — repeatedly delete ALL nodes of degree < k (and
    * their edges) until none remain. Returns (node, core_deg): the
    * surviving nodes with their degree INSIDE the core. The k-core is
    * unique, so simultaneous deletion converges to the same fixpoint
    * regardless of peel order — any two engines agree exactly.
    *
    * Scale shape: each peel round is one degree hash aggregate and
    * two left-semi joins of the edge set against the survivor list —
    * nothing quadratic, no windows; the edge relation shrinks
    * monotonically so later rounds cost less, and per-round lineage
    * is truncated with a lazy localCheckpoint (the [[pageRank]]
    * discipline). Convergence is detected by the edge count (a driver
    * scalar). Round count is the peel DEPTH, not the node count —
    * every current sub-k node drops at once — but a long chain still
    * peels one layer per round (the same O(diameter) trap
    * [[graft.operators.Dedup.duplicateClustersStar]] exists to dodge
    * for components), hence the `maxRounds` guard; when the full
    * coreness layering is wanted in bounded rounds, use
    * [[corenessHIndex]].
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 100): DataFrame = {
    require(k >= 1, "k-core needs k >= 1")
    var cur = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
    var before = cur.count()
    var round = 0
    var converged = before == 0L
    while (!converged && round < maxRounds) {
      val keep = degrees(cur).filter(col("core_deg") >= k)
        .select(col("node"))
        .localCheckpoint(eager = false)
      val next = cur
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(eager = false)
      val after = next.count()
      converged = after == before
      before = after
      cur = next
      round += 1
    }
    // an unconverged peel would return interior chain nodes as core
    // members with NOTHING distinguishing them from a correct result
    // — fail loud instead of silently wrong (deep chains peel one
    // layer per round; raise maxRounds or use corenessHIndex)
    require(converged,
      s"$k-core peel did not converge within $maxRounds rounds " +
        s"($before edges remain): raise maxRounds, or use the " +
        "bounded-round corenessHIndex")
    degrees(cur).filter(col("core_deg") >= k)
  }

  /** Fixed-round h-index refinement toward CORENESS (Lü et al. 2016,
    * "The H-index of a network node and its relation to degree and
    * coreness"): start every node at its degree and repeatedly
    * replace each node's value with the H-INDEX of its neighbors'
    * values (the largest h with ≥ h neighbors valued ≥ h). The
    * sequence is monotonically non-increasing and its fixpoint IS the
    * coreness — `rounds` iterations give the coreness's provable
    * upper bound at refinement depth `rounds`, the bounded-round form
    * a 100 TB run wants (the exact peel's round count is the core
    * layering depth, O(n) on chains; this refines every node
    * simultaneously in O(1) joins per round).
    *
    * Scale shape per round: one edges⨝values hash join fans each
    * node's neighbor values, a per-node descending rank window
    * computes max(min(rank, value)) — the h-index as one window +
    * one aggregate, no neighbor-list materialization — and lineage
    * truncates with a lazy localCheckpoint. The window partitions by
    * node: a hub sorts its degree's worth of rows, the same
    * per-partition cost every per-node-top-k in this engine pays.
    */
  def corenessHIndex(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val nbr = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint(eager = false)
    var vals = nbr.groupBy(col("node")).agg(count(lit(1)).as("h"))
    for (_ <- 1 to rounds) {
      val w = Window.partitionBy(col("node")).orderBy(col("h").desc)
      vals = nbr
        .join(vals.select(col("node").as("nbr"), col("h")), Seq("nbr"))
        .withColumn("r", row_number().over(w).cast("long"))
        .select(col("node"), least(col("r"), col("h")).as("cand"))
        .groupBy(col("node")).agg(max(col("cand")).as("h"))
        .localCheckpoint(eager = false)
    }
    vals
  }

  /** Bounded-radius multi-source BFS over the DIRECTED edge set:
    * hop distance from the nearest of `sources`, for every node
    * reachable within `maxHops` — the neighborhood function a crawl
    * scheduler runs from its seed set ("how far is this host from a
    * trusted seed"). Exact by construction: round t settles exactly
    * the nodes at distance t, so `maxHops` rounds IS the bounded-
    * radius answer, with no convergence detection needed.
    *
    * Scale shape: frontier-only expansion — round t joins the edge
    * set against ONLY the nodes settled at t−1 (not all settled
    * nodes), so total join work is Σ|frontier-adjacent edges| ≤
    * |E|·1 per round in the worst case but typically a small
    * fraction; settled state rides a node-keyed left join with
    * per-round lazy localCheckpoint lineage truncation. No windows,
    * nothing quadratic.
    */
  def bfsHops(edges: DataFrame, sources: Seq[String],
              maxHops: Int): DataFrame = {
    require(sources.nonEmpty, "BFS needs at least one source")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var dist = nodes.select(col("node"),
        when(col("node").isin(sources: _*), lit(0L))
          .otherwise(lit(null).cast("long")).as("hops"))
      .localCheckpoint(eager = false)
    for (t <- 1 to maxHops) {
      val frontier = dist.filter(col("hops") === (t - 1))
        .select(col("node").as("src"))
      val reached = e.join(frontier, Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .withColumn("settle", lit(t.toLong))
      dist = dist.join(reached, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hops"), col("settle")).as("hops"))
        .localCheckpoint(eager = false)
    }
    dist.filter(col("hops").isNotNull)
  }

  /** Per-node local clustering coefficient (Watts & Strogatz 1998):
    * cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) with T(v) the triangles
    * through v — the community-structure microscope the global
    * [[triangleCount]] ratio averages away. Every node appears, with
    * cc = 0 when deg < 2.
    *
    * Scale shape: the SAME degree-oriented wedge join as
    * [[triangleCount]] (each triangle materializes once as a closed
    * wedge), then each closed wedge fans to its THREE member nodes —
    * a 3× explode of triangle-count rows, not wedge-count — and a
    * node-keyed aggregate joins back to the degree table. No
    * per-node neighborhood materialization ever happens.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val ka = struct(col("da").as("d"), col("a").as("n"))
    val kb = struct(col("db").as("d"), col("b").as("n"))
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("u"),
        when(ka < kb, col("b")).otherwise(col("a")).as("v"),
        when(ka < kb, kb).otherwise(ka).as("vkey"))
      .localCheckpoint(eager = false)
    val closed = o.select(col("u"), col("v").as("w1"), col("vkey").as("k1"))
      .join(o.select(col("u"), col("v").as("w2"), col("vkey").as("k2")), "u")
      .filter(col("k1") < col("k2"))
      .join(o.select(col("u").as("w1"), col("v").as("w2")),
        Seq("w1", "w2"), "left_semi")
    val triPerNode = closed
      .select(explode(array(col("u"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc",
        when(col("deg") >= 2,
          lit(2.0) * col("n_tri").cast("double") /
            (col("deg").cast("double") * (col("deg").cast("double") - 1.0)))
          .otherwise(lit(0.0)))
  }
}
