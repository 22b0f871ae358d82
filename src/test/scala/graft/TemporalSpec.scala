package graft

import java.sql.Timestamp

import graft.operators.Temporal

/** Golden edges for the composed temporal operators. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("integer pageRank: hand-computed star graph, partitioning-invariant") {
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val got = graft.operators.Graphs.pageRank(edges, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=3: r0 = 333333 each, teleport = 150000/3 = 50000
    // b: 50000 + (85 * (333333 + 333333)) div 100 = 50000 + 566666
    assert(got === Map("a" -> 50000L, "b" -> 616666L, "c" -> 50000L))
    // deterministic under repartitioning and more iterations
    val r3a = graft.operators.Graphs.pageRank(edges.repartition(7), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r3b = graft.operators.Graphs.pageRank(edges, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r3a === r3b)
    // authority concentrates on the sink of the star
    assert(r3b("b") > r3b("a"))
  }

  test("pageRank on an empty edge set returns an empty frame") {
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    val got = graft.operators.Graphs.pageRank(edges, 3)
    assert(got.columns.toSeq === Seq("node", "rank"))
    assert(got.count() === 0L)
  }

  test("triangleCount: hand-computed graphs, duplicate/direction-proof") {
    def tri(pairs: Seq[(String, String)]): (Long, Long, Long) = {
      val r = graft.operators.Graphs.triangleCount(
        pairs.toDF("src", "dst")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K4: 6 edges, 4 triangles; oriented wedges = Σ C(outdeg, 2) =
    // C(3,2) + C(2,2) = 4 (id order breaks the all-equal-degree tie)
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    assert(tri(k4) === ((6L, 4L, 4L)))
    // path graph: no triangles; the middle vertex's two edges point
    // AWAY from it (ends have lower degree), so zero oriented wedges
    assert(tri(Seq(("a", "b"), ("b", "c"))) === ((2L, 0L, 0L)))
    // duplicate edges, reversed directions, and self-loops collapse
    val noisy = k4 ++ k4.map(_.swap) ++ Seq(("a", "a"), ("b", "b"))
    assert(tri(noisy) === ((6L, 4L, 4L)))
    // triangle + pendant edge: only apex a holds a wedge, it closes
    assert(tri(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")))
      === ((4L, 1L, 1L)))
  }

  test("pageRankWeighted: mass splits by edge weight, hand-computed") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L))
      .toDF("src", "dst", "weight")
    val got = graft.operators.Graphs.pageRankWeighted(edges, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=3: init 333333, teleport 50000, wdeg(a)=4
    // b: 50000 + 85*((333333*3) div 4) div 100 = 50000 + 212499
    // c: 50000 + 85*((333333*1) div 4) div 100 = 50000 + 70833
    assert(got === Map("a" -> 50000L, "b" -> 262499L, "c" -> 120833L))
    // duplicate weighted rows sum into the edge weight
    val dup = Seq(("a", "b", 2L), ("a", "b", 1L), ("a", "c", 1L))
      .toDF("src", "dst", "weight")
    val got2 = graft.operators.Graphs.pageRankWeighted(dup, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 === got)
    // bad weights fail loud instead of propagating null ranks — the
    // check rides the first aggregate pass (raise_error in the weight
    // projection), so it surfaces as a Spark execution failure whose
    // cause chain carries the message, and the clean path above paid
    // no extra validation job
    for (w <- Seq(Some(0L), Some(-2L), None)) {
      val bad = Seq(("a", "b", w), ("a", "c", Some(1L)))
        .toDF("src", "dst", "weight")
      val ex = intercept[Throwable] {
        graft.operators.Graphs.pageRankWeighted(bad, 1).collect()
      }
      val messages = Iterator.iterate[Throwable](ex)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .toSeq
      assert(messages.exists(_.contains("positive")),
        s"cause chain must carry the weight contract: $messages")
    }
  }

  test("personalizedPageRank: hand-computed star, absent seed yields zero mass") {
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val got = graft.operators.Graphs
      .personalizedPageRank(edges, Seq("a"), 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // init: a = 1000000, rest 0; teleport (seed-only) = 150000
    // b: 0 + (85 * 1000000) div 100; a: 150000 + 0; c never reached
    assert(got === Map("a" -> 150000L, "b" -> 850000L, "c" -> 0L))
    // a seed outside the graph contributes nothing anywhere
    val zero = graft.operators.Graphs
      .personalizedPageRank(edges, Seq("z"), 2).collect()
      .map(r => r.getLong(1)).toSet
    assert(zero === Set(0L))
  }

  /** K4 with a 3-node chain hung off node d: the classic planted
    * k-core fixture — the chain peels away layer by layer, the
    * clique survives any k ≤ 3.
    */
  private def cliquePlusChain: Seq[(String, String)] = {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    k4 ++ Seq(("d", "x"), ("x", "y"), ("y", "z"))
  }

  test("kCore: chain peels away, clique survives; k above max degree empties") {
    import spark.implicits._
    val edges = cliquePlusChain.toDF("src", "dst")
    val core2 = graft.operators.Graphs.kCore(edges, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2-core = K4 alone: x,y,z peel (z first, then y, then x) and d's
    // degree falls back to 3 inside the clique
    assert(core2 === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    val core3 = graft.operators.Graphs.kCore(edges, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core3 === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    assert(graft.operators.Graphs.kCore(edges, 4).count() === 0L)
    // duplicate/reversed/self-loop noise cannot change the core
    val noisy = (cliquePlusChain ++ cliquePlusChain.map(_.swap) ++
      Seq(("a", "a"))).toDF("src", "dst")
    val core2n = graft.operators.Graphs.kCore(noisy, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core2n === core2)
  }

  test("corenessHIndex: converges to the true coreness, monotone from above") {
    import spark.implicits._
    val edges = cliquePlusChain.toDF("src", "dst")
    def vals(rounds: Int): Map[String, Long] =
      graft.operators.Graphs.corenessHIndex(edges, rounds)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // true coreness: clique nodes 3, chain nodes 1
    val expected = Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "x" -> 1L, "y" -> 1L, "z" -> 1L)
    assert(vals(6) === expected)
    // round 0 = degrees (the starting upper bound); refinement is
    // monotone non-increasing toward the fixpoint
    val r0 = vals(0)
    assert(r0("d") === 4L && r0("x") === 2L)
    val r1 = vals(1)
    assert(expected.keys.forall(n => r1(n) <= r0(n)))
    assert(expected.keys.forall(n => expected(n) <= r1(n)))
  }

  test("bfsHops: exact bounded-radius distances on a directed fixture") {
    import spark.implicits._
    // s -> a -> b -> c -> e, s -> b (shortcut), plus unreachable u <- v
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("c", "e"),
      ("s", "b"), ("v", "u")).toDF("src", "dst")
    val got = graft.operators.Graphs.bfsHops(edges, Seq("s"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // radius 2: c settles via the s->b shortcut; e (dist 3) is absent,
    // and the (v, u) component never appears
    assert(got === Map("s" -> 0L, "a" -> 1L, "b" -> 1L, "c" -> 2L))
    // radius 4 reaches e; multi-source takes the nearest seed
    val got4 = graft.operators.Graphs.bfsHops(edges, Seq("s", "c"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got4 === Map("s" -> 0L, "c" -> 0L, "a" -> 1L, "b" -> 1L,
      "e" -> 1L))
  }
}

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: latest preceding, equal-ts matches, no-prior drops") {
    val right = Seq(
      (1L, ts("2020-01-01 10:00:00")),
      (1L, ts("2020-01-01 10:30:00")),
      (2L, ts("2020-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val left = Seq(
      (100L, 1L, ts("2020-01-01 10:15:00")), // between -> 10:00
      (101L, 1L, ts("2020-01-01 10:30:00")), // equal   -> 10:30
      (102L, 1L, ts("2020-01-01 09:00:00")), // no prior -> dropped
      (103L, 2L, ts("2020-01-01 12:01:00")), // other key -> 12:00
      (104L, 3L, ts("2020-01-01 23:00:00"))  // unseen key -> dropped
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.asOfJoin(left, right, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Timestamp]("asof_ts").toString)
      .toMap
    assert(got === Map(
      100L -> "2020-01-01 10:00:00.0",
      101L -> "2020-01-01 10:30:00.0",
      103L -> "2020-01-01 12:00:00.0"))
  }

  test("sessionize: gap strictly greater than threshold starts a session") {
    val events = Seq(
      (1L, 10L, ts("2020-01-01 10:00:00")),
      (2L, 10L, ts("2020-01-01 10:30:00")), // gap == 1800s -> SAME session
      (3L, 10L, ts("2020-01-01 11:00:01")), // gap 1801s   -> new session
      (4L, 20L, ts("2020-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
                 r.getAs[Long]("n_events")))
      .toSeq
    assert(got === Seq((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }

  test("range join: boundary lands in the upper band") {
    val bands = Seq((0.0, 50.0, "low"), (50.0, 100.0, "high"))
      .toDF("lo", "hi", "band")
    val facts = Seq((1L, 49.999), (2L, 50.0), (3L, 0.0)).toDF("id", "v")
    val got = Temporal.rangeJoin(facts, bands,
        org.apache.spark.sql.functions.col("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("band")).toMap
    assert(got === Map(1L -> "low", 2L -> "high", 3L -> "low"))
  }
}
