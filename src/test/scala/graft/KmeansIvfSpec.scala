package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Spherical k-means refinement of the IVF centroids: objective
  * monotonicity, unit-norm invariant, and drop-in use in ivfTopK.
  */
class KmeansIvfSpec extends SparkSpec {

  private lazy val emb =
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings")

  test("objective is non-decreasing across Lloyd iterations") {
    val c0 = Similarity.kmeansCentroids(emb, 8, 0)
    val c1 = Similarity.kmeansCentroids(emb, 8, 1)
    val c3 = Similarity.kmeansCentroids(emb, 8, 3)
    val o0 = Similarity.kmeansObjective(emb, c0)
    val o1 = Similarity.kmeansObjective(emb, c1)
    val o3 = Similarity.kmeansObjective(emb, c3)
    assert(o1 >= o0 - 1e-12, s"iteration 1 regressed: $o0 -> $o1")
    assert(o3 >= o1 - 1e-12, s"iteration 3 regressed: $o1 -> $o3")
  }

  test("centroids stay unit-norm and keep their ids") {
    val cent = Similarity.kmeansCentroids(emb, 8, 2)
    assert(cent.map(_._1) === (0 until 8))
    cent.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid $id norm $n")
    }
  }

  test("multi-probe LSH at radius 0 IS exact-bucket LSH, and wider radii only add") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 10)
    val anchors = emb.filter(col("vec_id") < 6)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("vec_id"), col("rn"))
        .as[(Long, Long, Int)].collect().toSet
    val exact = pairs(Similarity.lshTopK(emb, queries, anchors, 6, 10))
    val r0 = pairs(Similarity.lshTopKMultiProbe(emb, queries, anchors, 6, 10, 0))
    assert(r0 === exact, "radius-0 probing must equal the base operator")
    // radius-2 candidates are a superset, so every query's recall vs
    // brute force can only improve — checked end-to-end via hits
    val truth = Similarity.bruteForceTopK(emb, queries, 10)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val h0 = exact.count { case (q, v, _) => truth((q, v)) }
    val h2 = pairs(Similarity.lshTopKMultiProbe(emb, queries, anchors, 6, 10, 2))
      .count { case (q, v, _) => truth((q, v)) }
    assert(h2 > h0, s"radius-2 probing must strictly beat radius-0 on " +
      s"this fixture (superset candidates): $h2 vs $h0")
  }

  test("cell-co-assignment near-dup dominates the sign-bucket pair path") {
    val lsh = Similarity.nearDupRecallAgainst(emb,
      Similarity.nearDupLsh(emb, emb.filter(col("vec_id") < 6), 6, 0.35),
      0.35)
    val cells = Similarity.nearDupRecallAgainst(emb,
      Similarity.nearDupCells(emb, emb.filter(col("vec_id") < 8), 2, 0.35),
      0.35)
    // both audits share the same exact-cosine truth
    assert(cells.count() === lsh.count())
    val lf = lsh.filter(col("found")).count()
    val cf = cells.filter(col("found")).count()
    assert(cf > lf, s"cells found $cf <= lsh found $lf")
    // soft assignment beats hard: dropping to nProbe=1 must lose pairs
    val hard = Similarity.nearDupRecallAgainst(emb,
      Similarity.nearDupCells(emb, emb.filter(col("vec_id") < 8), 1, 0.35),
      0.35).filter(col("found")).count()
    assert(cf > hard, s"second probe cell buys nothing: $cf <= $hard")
  }

  test("semDedup flags lower-id near-dups within a cell only") {
    import spark.implicits._
    // two well-separated cells; 10/11 near-identical in cell A,
    // 20 alone in cell B even though 21 (cell A) is its id-neighbor
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // centroid A
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // centroid B
      (10L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (11L, Array(0.91f, 0.09f, 0.0f, 0.0f)), // dup of 10 (and 0)
      (20L, Array(0.5f, 0.86f, 0.0f, 0.0f))   // cell B, no cellmate within 0.95
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(corpus,
      corpus.filter(col("vec_id") < 2), 0.95).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === 5)
    assert(!got(0L).getAs[Boolean]("is_dup"))  // lowest id in its cell
    assert(got(10L).getAs[Boolean]("is_dup"))  // near 0 and each other
    assert(got(11L).getAs[Boolean]("is_dup"))
    assert(got(11L).getAs[Long]("n_dups") === 2L)
    assert(!got(20L).getAs[Boolean]("is_dup")) // only near-dups are in cell A
    assert(got(20L).getAs[Int]("cell") === 1)
  }

  test("tripletMining: positives are nearest, negatives disjoint and deterministic") {
    import spark.implicits._
    val corpus = (0 until 30).map { i =>
      (i.toLong, Array(math.cos(i * 0.2).toFloat, math.sin(i * 0.2).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val anchors = corpus.filter(col("vec_id") < 2)
    val got = Similarity.tripletMining(corpus, anchors, 3, 4).collect()
    val byAnchor = got.groupBy(_.getLong(0))
    byAnchor.foreach { case (q, rows) =>
      val pos = rows.filter(_.getString(2) == "pos").map(_.getLong(1)).toSet
      val neg = rows.filter(_.getString(2) == "neg").map(_.getLong(1)).toSet
      assert(pos.size === 3 && neg.size === 4, s"anchor $q")
      assert(pos.intersect(neg).isEmpty, s"anchor $q overlap")
      assert(!pos.contains(q) && !neg.contains(q), s"anchor $q self")
    }
    // anchor 0's nearest on the unit circle are its angular neighbors
    // (the circle wraps: 29 sits at 5.8 rad ≈ −0.48, closer than 3's 0.6)
    assert(byAnchor(0L).filter(_.getString(2) == "pos").map(_.getLong(1)).toSet
      === Set(1L, 2L, 29L))
    // deterministic across partitionings
    val again = Similarity.tripletMining(corpus.repartition(7), anchors, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(again === got.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
  }

  test("refined centroids drop into ivfTopK and keep or beat recall") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val naive = recall(Similarity.ivfTopK(emb, queries,
      emb.filter(col("vec_id") < 8), nProbe = 2, k = 10))
    val refined = recall(Similarity.ivfTopKWith(emb, queries,
      Similarity.kmeansCentroids(emb, 8, 3), nProbe = 2, k = 10))
    // refinement spreads the cells; recall with the same probe budget
    // must not collapse (allow small jitter below the naive seed)
    assert(refined >= naive - 0.05, s"naive $naive vs refined $refined")
    assert(refined > 0.3, s"refined recall too low: $refined")
  }

  test("ivfWriteIndex is self-contained: stored quantizer serves bit-identically") {
    val path = s"target/test-atrest/ivfidx-${System.nanoTime()}"
    val cent = Similarity.lloydCentroidDf(emb, 8, 1)
    Similarity.ivfWriteIndex(emb, cent, path)
    // layout completeness: codes + meta + cent all present, meta
    // records the corpus size and cell count the index was built at
    val meta = spark.read.parquet(s"$path/meta").collect().head
    assert(meta.getAs[Long]("built_n") === emb.count())
    assert(meta.getAs[Int]("cells") === 8)
    // the stored quantizer IS the trained set, bit-exact
    val stored = Similarity.ivfStoredCentroids(spark, path)
      .orderBy("vec_id").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val trained = cent.orderBy("vec_id").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    assert(stored.map(_._1).toSeq === trained.map(_._1).toSeq)
    stored.zip(trained).foreach { case ((_, s), (_, t)) =>
      assert(s.toSeq === t.toSeq)
    }
    // serving from the standing layout == the full-lifecycle result
    val queries = emb.filter(col("vec_id") < 5)
    val servedStanding = Similarity.ivfTopKAtRest(spark, s"$path/codes",
      queries, Similarity.ivfStoredCentroids(spark, path),
      nProbe = 2, k = 5).orderBy("q_id", "rn").collect()
    val servedFresh = Similarity.ivfTopKAtRest(spark, s"$path/codes",
      queries, cent, nProbe = 2, k = 5).orderBy("q_id", "rn").collect()
    assert(servedStanding.toSeq === servedFresh.toSeq)
    assert(servedStanding.nonEmpty)
  }

  test("ivfPqWriteIndex persists both trained components; stored books serve bit-identically") {
    val path = s"target/test-atrest/ivfpqidx-${System.nanoTime()}"
    val cent = emb.filter(col("vec_id") < 8)
    val books = Similarity.pqTrainBooks(emb, emb.filter(col("vec_id") < 16),
      m = 16, iters = 2)
    Similarity.ivfPqWriteIndex(emb, cent, books, path)
    // stored codebooks rebuild to the EXACT trained structure
    val stored = Similarity.ivfPqStoredBooks(spark, path)
    assert(stored.length === books.length)
    stored.zip(books).foreach { case (sb, tb) =>
      assert(sb.map(_._1) === tb.map(_._1))
      sb.zip(tb).foreach { case ((_, s), (_, t)) =>
        assert(s.toSeq === t.toSeq)
      }
    }
    val meta = spark.read.parquet(s"$path/meta").collect().head
    assert(meta.getAs[Long]("built_n") === emb.count())
    assert(meta.getAs[Int]("cells") === 8)
    assert(meta.getAs[Int]("m") === 16)
    // serving with stored quantizer + stored books == fresh components
    val queries = emb.filter(col("vec_id") < 5)
    val standing = Similarity.ivfPqTopKAtRest(spark, s"$path/codes",
      queries, Similarity.ivfStoredCentroids(spark, path),
      Similarity.ivfPqStoredBooks(spark, path), nProbe = 2, k = 5)
      .orderBy("q_id", "rn").collect()
    val fresh = Similarity.ivfPqTopKAtRest(spark, s"$path/codes",
      queries, cent, books, nProbe = 2, k = 5)
      .orderBy("q_id", "rn").collect()
    assert(standing.toSeq === fresh.toSeq)
    assert(standing.nonEmpty)
  }

  test("indexFresh: fresh layout serves; regenerated corpus (same rows) rebuilds") {
    import spark.implicits._
    val path = s"target/test-atrest/ivffresh-${System.nanoTime()}"
    val cent = Similarity.lloydCentroidDf(emb, 8, 1)
    Similarity.ivfWriteIndex(emb, cent, path)
    assert(Similarity.indexFresh(spark, path, emb))
    // same name, same ROW COUNT, different contents — the failure the
    // cent-exists check could not see (r14 ADVICE): one embedding
    // value perturbed must read stale
    val perturbed = emb.withColumn("embedding",
      when(col("vec_id") === 0L,
        transform(col("embedding"), x => x + lit(1.0f)))
        .otherwise(col("embedding")))
    assert(!Similarity.indexFresh(spark, path, perturbed))
    // a legacy meta without the sig column reads stale, not an error
    // (collect first: Spark refuses to overwrite a path it reads from)
    val legacy = spark.read.parquet(s"$path/meta").drop("sig")
    val legacyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.collect().toSeq), legacy.schema)
    legacyDf.write.mode("overwrite").parquet(s"$path/meta")
    assert(!Similarity.indexFresh(spark, path, emb))
    // and an incomplete layout (no cent marker) is never fresh
    assert(!Similarity.indexFresh(spark, s"$path-nowhere", emb))
  }

  test("ivfPqWriteIndex refuses a codebook set serving would refuse") {
    // read side caps total stored rows at 4096 (ivfPqStoredBooks);
    // the write side must enforce the SAME bound or a successful
    // build becomes a read-time failure (r14 ADVICE: asymmetric)
    val big: Similarity.Books = (0 until 32).map { _ =>
      (0 until 256).map(c => (c, Array.fill(2)(0.0))).toSeq
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqWriteIndex(emb, emb.filter(col("vec_id") < 4),
        big, s"target/test-atrest/ivfpqcap-${System.nanoTime()}")
    }
    assert(e.getMessage.contains("4096"))
  }

  test("residual IVFPQ: reconstruction identity, self-contained index, scan == at-rest") {
    val cent = emb.filter(col("vec_id") < 8)
    // residual + centroid[cell] recovers the original vector (the
    // decomposition the scoring identity q·x = q·c + q·r rests on)
    val orig = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val centVecs = cent.orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble))
    Similarity.residuals(emb, cent).collect().foreach { r =>
      val id = r.getLong(0)
      val res = r.getSeq[Double](1)
      val cv = centVecs(r.getInt(2))
      res.zip(cv).zip(orig(id)).foreach { case ((a, b), x) =>
        assert(math.abs(a + b - x) < 1e-9, s"vec $id")
      }
    }
    // the trained-residual index is self-contained and serves
    // bit-identically from stored components
    val books = Similarity.pqTrainBooksResidual(emb, cent,
      seedK = 16, 16, 2)
    val path = s"target/test-atrest/ivfpqres-${System.nanoTime()}"
    Similarity.ivfPqResidualWriteIndex(emb, cent, books, path)
    val meta = spark.read.parquet(s"$path/meta").collect().head
    assert(meta.getAs[String]("encoding") === "residual")
    val queries = emb.filter(col("vec_id") < 5)
    // the raw read path must REFUSE this layout (shape-identical to a
    // raw index; scoring residual codes as raw returns wrong
    // neighbors) — the residual reader opts in explicitly
    val refused = intercept[IllegalArgumentException] {
      Similarity.ivfPqStoredBooks(spark, path)
    }
    assert(refused.getMessage.contains("residual"))
    val standing = Similarity.ivfPqResidualTopKAtRest(spark,
        s"$path/codes", queries,
        Similarity.ivfStoredCentroids(spark, path),
        Similarity.ivfPqStoredBooks(spark, path, expectEncoding = "residual"),
        nProbe = 2, k = 5)
      .orderBy("q_id", "rn").collect()
    val scan = Similarity.ivfPqResidualTopKWith(emb, queries, cent,
        books, nProbe = 2, k = 5)
      .orderBy("q_id", "rn").collect()
    assert(standing.toSeq === scan.toSeq)
    assert(standing.nonEmpty)
  }

  test("PQ training monotonically reduces its own measured distortion") {
    def totalDist2(books: Similarity.Books): Double =
      Similarity.pqDistortionWith(emb, books)
        .agg(sum(col("dist2"))).head().getDouble(0)
    val cent = emb.filter(col("vec_id") < 16)
    val d0 = totalDist2(Similarity.pqInitBooks(cent, 16))
    val d1 = totalDist2(Similarity.pqTrainBooks(emb, cent, 16, 1))
    val d2 = totalDist2(Similarity.pqTrainBooks(emb, cent, 16, 2))
    // Lloyd: assignment and mean-update each never increase total
    // squared error, so the curve is monotone
    assert(d1 <= d0 + 1e-9, s"iteration 1 regressed: $d0 -> $d1")
    assert(d2 <= d1 + 1e-9, s"iteration 2 regressed: $d1 -> $d2")
    // and the trained quantizer keeps well over half the signal —
    // the audit the untrained max-dot codes failed (rel ≈ 1.2)
    val rel = Similarity
      .pqDistortionWith(emb, Similarity.pqTrainBooks(emb, cent, 16, 2))
      .agg(avg(col("rel_dist2"))).head().getDouble(0)
    assert(rel < 0.6, s"trained mean rel_dist2 too high: $rel")
  }

  test("trained books beat the untrained seed on top-k recall") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(books: Similarity.Books): Double = {
      val got = Similarity.pqTopKWith(emb, queries, books, 10)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val cent = emb.filter(col("vec_id") < 16)
    val init = recall(Similarity.pqInitBooks(cent, 16))
    val trained = recall(Similarity.pqTrainBooks(emb, cent, 16, 2))
    assert(trained >= init,
      s"training must not lose recall: $init -> $trained")
    assert(trained > 0.3, s"trained recall too low: $trained")
  }

  test("pqCodes emits one in-range code per subspace, map-side only") {
    val coded = Similarity.pqCodes(emb, emb.filter(col("vec_id") < 16), 4)
    val stats = coded.agg(
      count(lit(1)), min(col("code_0")), max(col("code_0")),
      min(col("code_3")), max(col("code_3"))).head()
    assert(stats.getLong(0) === emb.count())
    assert(stats.getInt(1) >= 0 && stats.getInt(2) < 16)
    assert(stats.getInt(3) >= 0 && stats.getInt(4) < 16)
    // coding is a projection: no exchange anywhere in the plan
    val plan = coded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("PQ top-k ranks against exact search with usable recall") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries,
        emb.filter(col("vec_id") < 16), m = 4, k = 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    // 16-entry data-derived codebooks over 4 subspaces: coarse, but the
    // reconstruction must still find a usable share of true neighbors
    assert(recall > 0.2, s"PQ recall collapsed: $recall")
    // corpus side must not shuffle: queries broadcast (bruteforce plan)
    val plan = Similarity.pqTopK(emb, queries,
      emb.filter(col("vec_id") < 16), 4, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("IVF-PQ composes the probe and code tiers without a cross product") {
    val queries = emb.filter(col("vec_id") < 10)
    val res = Similarity.ivfPqTopK(emb, queries,
      emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") < 16),
      m = 4, nProbe = 2, k = 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.1, s"IVF-PQ recall collapsed: $recall")
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // candidates meet probes on the cell key, a hash join
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("OPQ parametric rotation is orthogonal, preserves dots, and balances subspace variance") {
    import org.apache.spark.sql.functions.avg
    val rot = Similarity.opqParametricRotation(emb, 16)
    // R is orthogonal: R Rᵀ = I (row dots), so every dot-based score
    // — cell assignment, truth, cosine — is exactly preserved
    for (i <- rot.indices; j <- rot.indices) {
      val d = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)")
    }
    // the brute-force top-10 under rotation returns the SAME ids in
    // the same order (cosines equal to float tolerance)
    val q = emb.filter(col("vec_id") < 3)
    val raw = Similarity.bruteForceTopK(emb, q, 10)
      .orderBy("q_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rq = Similarity.rotated(q, rot)
    val rr = Similarity.bruteForceTopK(Similarity.rotated(emb, rot), rq, 10)
      .orderBy("q_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.toSeq === rr.toSeq)
    // and the point of the exercise: the PQ code budget sees a more
    // balanced decomposition — rotated-vector PQ distortion must not
    // exceed the raw decomposition's under the same training budget
    val rawBooks = Similarity.pqTrainBooks(emb,
      emb.filter(col("vec_id") < 16), 16, 1)
    val eRot = Similarity.rotated(emb, rot)
    val rotBooks = Similarity.pqTrainBooks(eRot,
      eRot.filter(col("vec_id") < 16), 16, 1)
    val dRaw = Similarity.pqDistortionWith(emb, rawBooks)
      .agg(avg(col("rel_dist2"))).head.getDouble(0)
    val dRot = Similarity.pqDistortionWith(eRot, rotBooks)
      .agg(avg(col("rel_dist2"))).head.getDouble(0)
    assert(dRot <= dRaw * 1.05,
      s"rotation should not worsen PQ distortion ($dRot vs $dRaw)")
  }
}
