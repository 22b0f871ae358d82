package graft

/** Scaling-structure pins for the five queries whose 100 TB claims rest
  * on capped/bucketed designs (VERDICT r6 #1): replicate the sf0.01
  * corpus 10× with [[ScaleSynth]] (replica-rotated text, so duplicate
  * structure grows LINEARLY — the property real corpus growth has) and
  * assert the outputs grow linearly too.
  *
  * The deterministic teeth are ROW-GROWTH bounds: a quadratic path —
  * an uncapped bucket, a cross join, cross-replica dup explosion —
  * produces ~100× the pairs at 10× the docs, against an upper bound of
  * 20×. Output correctness at organic SFs is the oracle gate's job;
  * here only growth shape is pinned, so the bounds are loose enough to
  * absorb per-replica LSH/SimHash recall noise (signatures re-randomize
  * under the replica substitution) yet two ORDERS below quadratic.
  *
  * Wall-time ratios at the full sf0.1 → sf1 (50k docs) pair are
  * enforced by the [[ScaleBench]] main (exit 1 on a quiet-box
  * violation of t(10×)/t(1×) < 15; SCALING.md records the curves); a
  * coarse in-suite timing bound runs here on the heaviest composite
  * only, with a generous allowance for the shared 4-thread test JVM.
  */
class ScalingSpec extends SparkSpec {

  private val baseDir = "/root/testdata/sf0.01"
  private val bigDir = "/tmp/graft-scale-test/sf0.01x10"

  private lazy val synthesized =
    ScaleSynth.synthesize(spark, baseDir, bigDir, replicas = 10)

  private def rows(name: String, dir: String): Long =
    Queries.queries(name)(spark, dir).count()

  test("10x corpus synthesis is deterministic and replica-distinct") {
    val (docRows, embRows) = synthesized
    assert(docRows === 5000L && embRows === 5000L)
    val docs = spark.read.parquet(s"$bigDir/documents.parquet")
    assert(docs.count() === 5000L)
    // replica 0 is verbatim; other replicas are distinct substitutions
    import org.apache.spark.sql.functions._
    val texts = docs.filter(col("doc_id") % 10000000L === 7L)
      .select("text").collect().map(_.getString(0))
    assert(texts.length === 10)
    assert(texts.distinct.length === 10,
      "replica substitutions must be pairwise distinct")
  }

  test("two-level substitutions are pairwise distinct across both decades") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one doc through 40 replicas (spanning both alphabet levels) must
    // yield 40 pairwise-distinct texts, with replica 0 verbatim and
    // replicas 1..9 matching the original single-level scheme
    val one = Seq((7L, "the rain in spain stays mainly on the plain",
      "en", "web", 43L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val reps = ScaleSynth.replicateDocs(one, 40)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(reps.size === 40)
    assert(reps.values.toSeq.distinct.size === 40,
      "substitutions must be pairwise distinct")
    assert(reps(7L) === "the rain in spain stays mainly on the plain")
    val firstDecade = one.select(
      translate(col("text"), ScaleSynth.Alphabet,
        ScaleSynth.Alphabet.drop(3) + ScaleSynth.Alphabet.take(3)))
      .as[String].head()
    assert(reps(7L + 3L * 10000000L) === firstDecade,
      "replicas < 10 must reproduce the single-level scheme exactly")
  }

  test("dedup pair outputs grow linearly, not quadratically, at 10x docs") {
    synthesized
    // (query, sf0.01 rows pinned by CORRECTNESS_r06, cross-replica
    // pairs admissible?) — the exact-Jaccard-verified queries admit NO
    // cross-replica pairs (replica substitutions collapse cross-replica
    // similarity, and a chance LSH candidate dies at the >= 0.5 verify);
    // SimHash verifies hamming <= 6 on just 32 bits, so candidates that
    // collide on the 16-bit bucket pass by CHANCE with p ~ 0.23 — a
    // birthday tail that grows with C(n,2)/2^16 regardless of replicas
    // (~43 expected at 5k docs; bounded at scale by the bucket cap).
    val cases = Seq(
      ("dedup_minhash_lsh", 25L, false),
      ("dedup_simhash_neardup", 6L, true),
      ("dedup_cross_corpus_lsh", 81L, false))
    cases.foreach { case (q, base, chanceTail) =>
      assert(rows(q, baseDir) === base, s"$q base-count drifted")
      val pairs = Queries.queries(q)(spark, bigDir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val big = pairs.length.toLong
      // The quadratic hazard at 10x is CROSS-replica pairing: exact
      // cross-replica duplication would turn every base dup cluster of
      // size c into one of size 10c — C(10c,2)/C(c,2) ~ 100x the
      // pairs. Within a replica the pair set re-randomizes around the
      // base count (signatures re-draw under the substitution, so
      // borderline pairs flicker — a 6-pair base can honestly measure
      // 10-20 per replica), hence a 40x total backstop, well below
      // quadratic, plus the sharp structural check where admissible:
      // pairs stay inside their replica (ids keep replica = id / 10^7).
      val crossReplica =
        pairs.count { case (a, b) => a / 10000000L != b / 10000000L }
      assert(big < 40 * base, s"$q: $big pairs at 10x docs (base $base)")
      assert(big > 2 * base, s"$q: only $big pairs at 10x docs (base $base)")
      if (!chanceTail)
        assert(crossReplica <= math.max(2L, big / 10),
          s"$q: $crossReplica of $big pairs cross replicas")
    }
  }

  test("textrank output is exactly 3 keywords per eligible doc at 10x docs") {
    synthesized
    val base = rows("text_textrank", baseDir)
    val big = rows("text_textrank", bigDir)
    // replication is exact: 10x the docs -> exactly 10x the rows (top-3
    // per >=2-token document); any deviation means the per-doc graph
    // iteration dropped or duplicated documents at scale
    assert(big === 10 * base, s"textrank rows: base $base, 10x $big")
  }

  test("lsh components grow linearly and stay within replicas at 10x docs") {
    synthesized
    val base = rows("dedup_lsh_components", baseDir)
    val big = Queries.queries("dedup_lsh_components")(spark, bigDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // linear growth band (the dedup-pair rationale: per-replica LSH
    // recall re-randomizes, cross-replica similarity collapses)
    assert(big.length < 40 * base,
      s"components: ${big.length} rows at 10x docs (base $base)")
    assert(big.length > 2 * base,
      s"components: only ${big.length} rows at 10x docs (base $base)")
    // a member's cluster label must come from its OWN replica — a
    // cross-replica component would mean the pair tier leaked one
    val cross = big.count { case (d, c) => d / 10000000L != c / 10000000L }
    assert(cross <= math.max(2L, big.length / 10L),
      s"components: $cross of ${big.length} members labeled cross-replica")
  }

  test("intake capstone output grows linearly at 10x docs") {
    synthesized
    assert(rows("pipeline_intake_dump", baseDir) === 35L)
    val big = rows("pipeline_intake_dump", bigDir)
    assert(big < 20 * 35 && big > 2 * 35, s"intake rows at 10x: $big")
  }

  test("cell near-dup pair output stays cap-bounded at 10x docs") {
    synthesized
    assert(rows("sim_neardup_cells", baseDir) === 201L,
      "base-count drifted")
    // cross-replica perturbed embeddings are TRUE near-dups, so the
    // raw pair space is quadratic in replicas (the ppjoin story) —
    // but the per-cell rank cap (256) bounds candidates at
    // 8 cells x C(256,2) REGARDLESS of corpus size; the pin is the
    // cap doing exactly that
    val big = rows("sim_neardup_cells", bigDir)
    assert(big <= 8L * 256 * 255 / 2,
      s"cells pair output $big exceeds the cap bound")
    assert(big > 201L, s"degenerate at 10x: $big")
  }

  test("ivf top-k output is scale-invariant (fixed queries, fixed k)") {
    synthesized
    // anchors/centroid seeds are vec_id < 10 / < 8 — replica-0
    // originals only, so 10 queries x k=10 rows at EVERY scale point
    assert(rows("sim_topk_ivf", baseDir) === 100L)
    assert(rows("sim_topk_ivf", bigDir) === 100L)
  }

  test("intake wall-time grows near-linearly at 10x docs (coarse)") {
    synthesized
    // wall-time in the shared 4-thread test JVM is machine-load
    // sensitive and this suite has no quiet-box gate (ScaleBench owns
    // the enforced curves, behind BenchEnv.awaitQuiet): on a contended
    // box run the passes anyway (they exercise the plans) but demote
    // the ratio assertion to a warning instead of a flake
    val contended = BenchEnv.load1() >= 8.0
    def timed(dir: String): Double = {
      val t0 = System.nanoTime()
      Queries.queries("pipeline_intake_dump")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timed(baseDir) // warm the plan/codegen paths
    val t1 = math.min(timed(baseDir), timed(baseDir))
    val t10 = math.min(timed(bigDir), timed(bigDir))
    // generous for the shared 4-thread test JVM: quadratic work would
    // exceed this by an order of magnitude; fixed overheads only help
    val msg =
      f"intake t(10x)/t(1x) = ${t10 / t1}%.1f (t1=$t1%.2fs t10=$t10%.2fs)"
    if (contended)
      info(s"SKIPPED ratio assertion (loadavg ${BenchEnv.load1()}): $msg")
    else assert(t10 / t1 < 25.0, msg)
  }
}
