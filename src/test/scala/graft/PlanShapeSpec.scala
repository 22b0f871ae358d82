package graft

/** Physical-plan shape assertions: the plans we designed for, not just
  * the first ones that passed (scale discipline — broadcasts where
  * dimensions are small, distributed top-k for sort+limit, partial
  * aggregation for the daily rollups).
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Queries.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5 joins every dimension with a broadcast, never a shuffle") {
    val p = plan("tpch_q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("fact-fact joins are shuffled HASH joins (no sorts, no broadcast)") {
    // lineitem⨝orders (q5) and (customer⨝orders)⨝lineitem (q3) must
    // shuffle-hash-join: the only strategy that holds at 100 TB, and
    // the one that keeps tiny-SF probes off the single scan task
    val p5 = plan("tpch_q5_local_supplier")
    assert("ShuffledHashJoin".r.findAllIn(p5).size === 1, p5.take(2000))
    val p3 = plan("tpch_q3_shipping")
    assert("ShuffledHashJoin".r.findAllIn(p3).size === 1, p3.take(2000))
    assert(!p3.contains("SortMergeJoin"), p3.take(2000))
  }

  test("q2 broadcasts dims and the per-part min; q7 shuffle-hashes both fact joins") {
    val p2 = plan("tpch_q2_mincost")
    // dimension chain + decorrelated min table all arrive broadcast;
    // lineitem is never shuffled on a join key
    assert("BroadcastHashJoin".r.findAllIn(p2).size >= 3, p2.take(2000))
    assert(!p2.contains("SortMergeJoin"), p2.take(2000))
    assert(!p2.contains("CartesianProduct"), p2.take(2000))
    val p7 = plan("tpch_q7_volume")
    // orders⨝customer and lineitem⨝orders are both fact-sized at
    // scale: exactly two shuffled hash joins, nation broadcast twice
    assert("ShuffledHashJoin".r.findAllIn(p7).size === 2, p7.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p7).size >= 3, p7.take(2000))
    assert(!p7.contains("SortMergeJoin"), p7.take(2000))
  }

  test("q8/q17/q22: pinned fact joins, broadcast thresholds, no cartesian") {
    val p8 = plan("tpch_q8_market_share")
    // orders⨝customer and lineitem⨝orders shuffle-hash; dims broadcast
    assert("ShuffledHashJoin".r.findAllIn(p8).size === 2, p8.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p8).size >= 3, p8.take(2000))
    assert(!p8.contains("SortMergeJoin"), p8.take(2000))
    val p17 = plan("tpch_q17_small_qty")
    // the decorrelated per-part avg arrives broadcast; lineitem never
    // shuffles on a join key
    assert(p17.contains("BroadcastHashJoin"), p17.take(2000))
    assert(!p17.contains("SortMergeJoin") && !p17.contains("CartesianProduct"),
      p17.take(2000))
    val p22 = plan("tpch_q22_dormant")
    // scalar threshold is a broadcast nested-loop (1 row), the orders
    // complement is a LEFT-ANTI hash join — never materialized
    assert(p22.contains("BroadcastNestedLoopJoin"), p22.take(2000))
    assert(p22.contains("LeftAnti"), p22.take(2000))
  }

  test("salted join and LSH near-dup never plan a cross product") {
    assert(!plan("rel_salted_join").contains("CartesianProduct"))
    val p = plan("sim_neardup_lsh")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("sort+limit plans as distributed top-k (TakeOrderedAndProject)") {
    assert(plan("o08_select_range").contains("TakeOrderedAndProject"))
    assert(plan("tpch_q3_shipping").contains("TakeOrderedAndProject"))
  }

  test("daily aggregates use partial+final hash aggregation") {
    val p = plan("o10_daily_average")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("brute-force ANN broadcasts the query side") {
    val p = plan("sim_topk_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("scans prune columns: daily average reads only ts and value") {
    val p = plan("o10_daily_average")
    // ts has shipped as TIMESTAMP(NANOS)-read-as-long and as µs
    // TIMESTAMP_NTZ across driver testdata generations; the pruning
    // claim (two columns reach the scan) is the invariant
    assert(p.contains("ReadSchema: struct<ts:bigint,value:double>") ||
      p.contains("ReadSchema: struct<ts:timestamp_ntz,value:double>"),
      p.take(2000))
  }

  test("stratified sampling pre-truncates map-side (WindowGroupLimit)") {
    val p = plan("pipeline_sample_stratified")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    // both partial (pre-shuffle) and final passes
    assert(p.contains("Partial") && p.contains("Final"), p.take(2000))
  }

  test("decontamination broadcasts the eval side, never self-joins train") {
    val p = plan("pipeline_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q18 keeps the rollup join shuffled-hash, customers broadcast, top-k distributed") {
    val p = plan("tpch_q18_large_volume")
    assert("ShuffledHashJoin".r.findAllIn(p).size === 1, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("line dedup truncates hot-line buckets map-side (WindowGroupLimit)") {
    val p = plan("dedup_lines")
    // rank-1 filter on the first-occurrence window must pre-truncate
    // each map task before the line-hash shuffle
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("quality cutoff broadcasts the 1-row percentile, no driver collect") {
    val p = plan("pipeline_quality_cutoff")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("DSIR selection broadcasts the bucket table back to the gram stream") {
    val p = plan("pipeline_dsir_select")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("vocabulary top-k plans as distributed top-k, not a global sort") {
    val p = plan("text_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("sequence packing broadcasts the bucket offsets (two-level prefix sum)") {
    val p = plan("pipeline_pack_sequences")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("curate-tokenize capstone plans without a cartesian product") {
    val p = plan("pipeline_curate_tokenize")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the vocab side of the token→id join broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("semDedup joins stay hash-based: cell pairs and the dup-count merge") {
    val p = plan("sim_semdedup")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("gopher rules and C4 line filter are pure projections: no wide exchanges") {
    // both gates must stay embarrassingly parallel — a hash/range
    // exchange here means a rule accidentally aggregated across
    // documents (the loader's tiny-SF round-robin pre-spread is the
    // only exchange allowed)
    for (q <- Seq("text_gopher_rules", "pipeline_c4_line_filter")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q: ${p.take(2000)}")
      assert(!p.contains("Exchange rangepartitioning"), s"$q: ${p.take(2000)}")
      assert(!p.contains("HashAggregate"), s"$q: ${p.take(2000)}")
    }
  }

  test("NB classifier: model broadcasts to the scoring join, no sorts or cartesians") {
    // train is one hash aggregation over dims keys; scoring joins the
    // dims-row model broadcast against the token stream — the only
    // shape that holds when the corpus is 100 TB and the model is 64
    // rows. A SortMergeJoin or cartesian here means the broadcast hint
    // was lost; a rangepartitioning exchange means something sorted
    // the token stream.
    for (q <- Seq("pipeline_nb_score", "pipeline_nb_confusion")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(2000)}")
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
      assert(!p.contains("Exchange rangepartitioning"), s"$q: ${p.take(2000)}")
    }
  }

  test("CMS sketch and spectrum stay hash-aggregated, broadcast-joined") {
    val p = plan("text_cms_topk")
    // the sketch (depth·width rows) broadcasts to the candidate join
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val gt = plan("text_good_turing")
    // the spectrum self-join broadcasts its successor side
    assert(gt.contains("BroadcastHashJoin"), gt.take(2000))
    assert(!gt.contains("SortMergeJoin"), gt.take(2000))
  }

  test("ngram frequency score: hash joins and aggregates, no sorts") {
    // counts aggregate BEFORE the join (broadcastable at this SF); the
    // raw gram stream must never be sorted or cross-joined
    val p = plan("pipeline_ngram_freq_score")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("SortAggregate"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("ccnet/kn tiers + vocab growth: no corpus through one reducer") {
    // the r14 verdict's last single-reducer plans: the tier split now
    // rides the range-exchange two-level rank and the growth curve the
    // two-level prefix sum — the ONLY rows allowed across a singleton
    // exchange are bucket-count aggregates (≤ shuffle-partition rows)
    for (q <- Seq("pipeline_ccnet_buckets", "pipeline_kn_buckets",
        "text_vocab_growth")) {
      val p = plan(q)
      assert(!p.contains("ntile"), s"$q: global NTILE window survived")
      val lines = p.linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Exchange SinglePartition"))
          assert(lines.slice(i + 1, i + 3).exists(_.contains("HashAggregate")),
            s"$q: a singleton exchange moves non-aggregated rows:\n" +
              lines.slice(math.max(0, i - 2), i + 4).mkString("\n"))
      }
    }
    // the tier rank rides a PARALLEL range exchange (hidden behind the
    // checkpoint boundary in the query plans above, so pinned on the
    // factored pre-checkpoint relation): rangepartitioning across the
    // shuffle partitions, never `Exchange SinglePartition` + Sort
    import spark.implicits._
    val ranked = graft.operators.TextAnalysis
      .rankKeyed(Seq((1L, 1.0), (2L, 2.0)).toDF("doc_id", "s"), "s")
      .queryExecution.executedPlan.toString
    assert(ranked.contains("Exchange rangepartitioning"), ranked.take(2000))
    assert(!ranked.contains("Exchange SinglePartition"), ranked.take(2000))
  }

  test("deterministic shuffle never plans a global range sort") {
    // the whole point of the two-level form: rank without funneling
    // the corpus through one ordered partition
    val p = plan("pipeline_shuffle_rank")
    assert(!p.contains("Exchange rangepartitioning"), p.take(2000))
  }

  test("gopher repetition battery: hash aggregates, no sorts or cross joins") {
    val p = plan("text_gopher_repetition")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // every per-n rollup is a partial+final hash aggregate, never a
    // sort-based aggregate over the exploded gram stream
    assert(!p.contains("SortAggregate"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q6 pushes every predicate to the parquet scan") {
    // (the PushedFilters list truncates in toString — assert its head
    // plus the full pruned read schema, which is not truncated)
    val p = plan("tpch_q6_forecast")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(3000))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"), p.take(3000))
    // scan reads only the four needed columns
    assert(!p.contains("l_orderkey"), p.take(3000))
  }

  test("q4 EXISTS plans as a left-semi hash join, not a dedup-then-join") {
    val p = plan("tpch_q4_priority")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q10 keeps the fact join shuffled-hash and the top-k distributed") {
    val p = plan("tpch_q10_returns")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q14 broadcasts the part dimension") {
    val p = plan("tpch_q14_promo")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("ingest enrichment is pure codegen: no opaque eval in the plan") {
    // O1-O3 (syslog parse -> validate -> UA/GeoIP enrich) is the hot
    // streaming path: every operator must stay inside whole-stage
    // codegen. A UDF would appear as an opaque invoke/eval node, a
    // typed map as (De)SerializeObject, a naive BETWEEN geo join as a
    // BroadcastNestedLoopJoin scanning every range per row.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = Seq(
      """<190>ballcone: {"service":"web","ip":"10.0.0.7","host":"h","path":"/x","status":"200","referrer":"","user_agent":"Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0","length":"17","generation_time_milli":"0.2","date":"2026-01-01T00:00:00+00:00"}"""
    ).toDF("value")
    val ranges = Seq((167772160L, 184549375L, "US"))
      .toDF("ip_start", "ip_end", "country")
    val enriched = graft.sources.Ingest.pipeline(lines, ranges)
    // collect() executes THIS dataframe's QueryExecution (head()/write
    // would derive a new one), so AQE finalizes the plan and the
    // WholeStageCodegen spans appear
    val rows = enriched.collect()
    assert(rows.length === 1)
    val row = enriched.select("country_iso_code", "browser_name",
      "platform_name", "is_robot").head()
    assert(row.getString(0) === "US" && row.getString(1) === "Chrome")
    assert(row.getString(2) === "Windows" && !row.getBoolean(3))
    val p = enriched.queryExecution.executedPlan.toString
    // (static_invoke of builtin codecs like UrlCodec is codegen'd
    // Spark machinery, not an opaque call — only ScalaUDF/typed-map
    // nodes break whole-stage codegen)
    // lambdafunction = higher-order builtin, interpreted-eval (codegen
    // fallback) — also banned from the hot path, not just UDFs
    Seq("DeserializeToObject", "SerializeFromObject", "MapElements",
        "MapPartitions", "BatchEval", "ScalaUDF", "lambdafunction")
      .foreach { opaque =>
        assert(!p.contains(opaque), s"opaque node $opaque in:\n${p.take(2000)}")
      }
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // codegen stages print as "*(n)" in the finalized adaptive plan;
    // the json_tuple parse, validation, UA parse, ipv4ToLong (a flat
    // split/element_at projection since round 7 — no higher-order
    // fold), and the hash join all run inside those stages
    assert(p.contains("*("), p.take(2000))
  }

  test("q11 reuses the per-part shuffle for its global total at runtime") {
    // importantParts feeds one aggregate to BOTH the threshold total
    // and the join — a naive plan scans lineitem twice. The static
    // plan shows two scans, but AQE's exchange reuse (default on)
    // collapses them into ONE materialized shuffle stage; this pin
    // executes the query and asserts the finalized adaptive plan
    // actually contains a Reused node, so a config or Spark upgrade
    // that silently breaks the reuse fails here, not at 100 TB.
    val df = Queries.queries("tpch_q11_important_parts")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan"), p.take(500))
    assert(p.contains("Reused"), "per-part exchange not reused:\n" +
      p.take(3000))
  }

  test("q20 shape: dims and the excess key set broadcast, nothing sorts") {
    val p = plan("tpch_q20_potential_promo")
    // promo part filter into both fact passes + nation into supplier +
    // the excess supplier semi-join all arrive broadcast; the only
    // shuffle keys the (partkey, suppkey) aggregate
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("HLL aggregates registers with map-side partials (the mergeability claim)") {
    val p = plan("o11_daily_unique_hll")
    // partial_max(rho) before the exchange: the shuffle carries at
    // most m register rows per (day, mapper), never per-user rows —
    // THE property that makes the sketch the shards-and-streams
    // distinct; the exact count alongside uses the same partial
    // discipline for its distinct
    assert(p.contains("partial_max"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("textrank's fixed rounds reuse the edge exchange at runtime (no caching)") {
    // the OOM fix dropped per-round localCheckpoints in favor of
    // exchange reuse across the repeated edge/node/degree subtrees —
    // this pin executes the query and asserts the finalized adaptive
    // plan actually contains Reused nodes, so a config or Spark
    // upgrade that breaks the reuse fails here, not as an sf10 OOM
    val df = Queries.queries("text_textrank")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan"), p.take(500))
    assert(p.contains("Reused"), "textrank edge exchange not reused:\n" +
      p.take(3000))
  }

  test("q16 broadcasts the filtered part dim; distinct is partial") {
    val p = plan("tpch_q16_supplier_cnt")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    // countDistinct plans as a two-level aggregate: the (bucket,
    // suppkey) de-dup happens with map-side partials before the final
    // count — the fact never funnels through one reducer
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("hybrid RRF reduces each retriever with distributed top-k") {
    val p = plan("text_hybrid_rrf")
    // both sides must cut to n rows with TakeOrderedAndProject BEFORE
    // their rank windows — a global sort here would be corpus-scaled
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("linear silhouette plans NO pairwise join — broadcasts only") {
    // the whole point of the sum-vector trick: the only joins are the
    // k-row cell table arriving broadcast (one hash, one nested-loop
    // for the keyless cross). A shuffled join or a window here would
    // mean a corpus-scaled pair structure crept back in.
    val p = plan("sim_silhouette")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("WindowExec"), p.take(2000))
    // JL projection: literal sign sums are a pure projection — the
    // anchor row is the only join, arriving broadcast
    val pr = plan("sim_rand_proj")
    assert("BroadcastNestedLoopJoin".r.findAllIn(pr).size === 1,
      pr.take(2000))
    assert(!pr.contains("SortMergeJoin") && !pr.contains("ShuffledHashJoin"),
      pr.take(2000))
  }

  test("ppjoin and blocked edit-distance never degrade to sorts or crosses") {
    // ppjoin: candidate + verify joins are hash equi-joins (broadcast
    // at this SF, shuffled-hash at scale); the only windows are the
    // per-doc prefix ranks — a global range sort would be corpus-scaled
    val p = plan("dedup_ppjoin")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Exchange rangepartitioning"), p.take(2000))
    val pe = plan("dedup_edit_blocked")
    assert(!pe.contains("SortMergeJoin"), pe.take(2000))
    assert(!pe.contains("CartesianProduct"), pe.take(2000))
    // the thresholded levenshtein must be in the join output, not the
    // full-table form (the 70x early-abandon win at sf0.1)
    assert(pe.contains("levenshtein"), pe.take(2000))
  }

  test("q9 shape: one fact-fact shuffle hash, three broadcasts, no SMJ") {
    val p = plan("tpch_q9_profit_shape")
    assert("ShuffledHashJoin".r.findAllIn(p).size === 1, p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("round-9 narrow shapes stay join-free and sort-free") {
    // interarrival: per-key window + hash agg; phash: typed narrow map
    // + one hash agg; compress: pure narrow map; weighted sample: one
    // TakeOrderedAndProject, never a global sort exchange
    for (q <- Seq("rel_interarrival", "mm_phash_dedup",
        "text_compress_ratio")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: ${p.take(2000)}")
      assert(!p.contains("Exchange rangepartitioning"),
        s"$q: ${p.take(2000)}")
    }
    val ws = plan("pipeline_sample_weighted")
    assert("TakeOrderedAndProject".r.findAllIn(ws).size === 1,
      ws.take(2000))
    assert(!ws.contains("Exchange rangepartitioning"), ws.take(2000))
  }

  test("at-rest IVF scan prunes to the probed cells via PartitionFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = graft.core.Tables.read(spark, sf, "embeddings")
    val path = "target/atrest/ivf-planshape"
    Similarity.ivfWriteAtRest(e, e.filter(col("vec_id") < 8), path)
    // 2 queries x 2 probes <= 4 of the 8 cells: pruning must show
    val df = Similarity.ivfTopKAtRest(spark, path,
      e.filter(col("vec_id") < 2), e.filter(col("vec_id") < 8),
      nProbe = 2, k = 10)
    // sparkPlan, not executedPlan: AQE wraps the latter before
    // execution and hides the scan nodes from collect
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("ivf-planshape")) => s
    }
    assert(scans.nonEmpty, "at-rest scan missing from the plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"no cell PartitionFilter: ${scan.partitionFilters}")
    // the pruned scan reads at most |queries|*nProbe of the 8 cell
    // directories — file-level pruning, not a post-scan filter. The
    // static isin filter alone decides this (the planner may ALSO add
    // a dynamic-pruning subquery for the probe join; that one cannot
    // be evaluated pre-execution, so it is excluded here)
    val static = scan.partitionFilters
      .filterNot(_.toString.contains("dynamicpruning"))
    val probed = scan.relation.location.listFiles(static, Nil).length
    assert(probed <= 4, s"scan reads unprobed cells: $probed of 8")
    // and the pruned path returns exactly the scan-time-assignment rows
    val atRest = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Similarity.ivfTopK(e, e.filter(col("vec_id") < 2),
        e.filter(col("vec_id") < 8), nProbe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atRest === direct)
  }

  test("at-rest selection round scan prunes to its surviving cells") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = graft.core.Tables.read(spark, sf, "embeddings")
    val path = "target/atrest/kc-planshape"
    Similarity.ivfWriteAtRest(e, e.filter(col("vec_id") < 8), path)
    val df = Similarity.ivfCellsScan(spark, path, Seq(1, 4))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"no cell PartitionFilter: ${scan.partitionFilters}")
    val static = scan.partitionFilters
      .filterNot(_.toString.contains("dynamicpruning"))
    assert(scan.relation.location.listFiles(static, Nil).length <= 2,
      "a 2-cell survivor set must read <= 2 cell directories")
  }

  test("graph-ANN serving never scans the corpus: bucket-pruned at-rest reads only") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = graft.core.Tables.read(spark, sf, "embeddings")
    val path = "target/atrest/graph-planshape"
    Similarity.graphWriteAtRest(e, e.filter(col("vec_id") < 8), 10, 1, path)
    val df = Similarity.graphTopKAtRest(spark, path,
      e.filter(col("vec_id") < 2), e.filter(col("vec_id") < 8),
      beam = 4, rounds = 1, k = 10)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "final round's pruned scans missing from plan")
    // every file scan in the returned plan reads the at-rest layout —
    // the corpus parquet (embeddings) never appears: queries are a
    // checkpointed literal-sized relation, vectors come from `nodes`
    scans.foreach { s =>
      val roots = s.relation.location.rootPaths.map(_.toString)
      assert(roots.forall(_.contains("graph-planshape")),
        s"non-at-rest scan in serving plan: $roots")
      assert(s.partitionFilters.exists(_.toString.contains("bucket")),
        s"no bucket PartitionFilter: ${s.partitionFilters}")
    }
    // Pruning is pinned on the two reads the driver loop actually
    // issues per round (r17: the loop merges candidates driver-side,
    // so the RETURNED plan is the final scoring pass over the full
    // accumulated candidate set — at this test's corpus size that set
    // legitimately covers every bucket; the per-round reads below are
    // where file-level pruning carries the 100 TB claim). A 2-id
    // frontier must prune both relations to ≤ 2 bucket directories.
    val adjBk = spark.read.parquet(s"$path/meta")
      .select(col("buckets")).head.getInt(0)
    Seq(
      Similarity.graphAdjPruned(spark, path, Seq(3L, 7L), adjBk),
      Similarity.graphNodesPruned(spark, path, Seq(3L, 7L), adjBk)
    ).foreach { pruned =>
      val aScans = pruned.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(aScans.nonEmpty)
      val aScan = aScans.head
      assert(aScan.partitionFilters.exists(_.toString.contains("bucket")))
      val aStatic = aScan.partitionFilters
        .filterNot(_.toString.contains("dynamicpruning"))
      assert(aScan.relation.location.listFiles(aStatic, Nil).length <= 2,
        "2 frontier ids must prune to <= 2 bucket directories")
    }
  }

  test("at-rest IVFPQ layout prunes cells AND carries only code columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = graft.core.Tables.read(spark, sf, "embeddings")
    val books = Similarity.pqTrainBooks(e, e.filter(col("vec_id") < 16),
      m = 16, iters = 1)
    val path = "target/atrest/ivfpq-planshape"
    Similarity.ivfPqWriteAtRest(e, e.filter(col("vec_id") < 8), books, path)
    val df = Similarity.ivfPqTopKAtRest(spark, path,
      e.filter(col("vec_id") < 2), e.filter(col("vec_id") < 8), books,
      nProbe = 2, k = 10)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("ivfpq-planshape")) => s
    }
    assert(scans.nonEmpty, "at-rest scan missing from the plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"no cell PartitionFilter: ${scan.partitionFilters}")
    val static = scan.partitionFilters
      .filterNot(_.toString.contains("dynamicpruning"))
    assert(scan.relation.location.listFiles(static, Nil).length <= 4,
      "scan reads unprobed cells")
    // the layout's POINT: the stored relation has no embedding column
    // at all — only vec_id + the m code columns ride the probe join
    assert(!scan.schema.fieldNames.contains("embedding"),
      s"full vectors stored at rest: ${scan.schema.fieldNames.mkString(",")}")
    assert(scan.schema.fieldNames.count(_.startsWith("code_")) === 16,
      scan.schema.fieldNames.mkString(","))
    // and the pruned stored-code path equals the scan-time composition
    val atRest = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Similarity.ivfPqTopKWith(e, e.filter(col("vec_id") < 2),
        e.filter(col("vec_id") < 8), books, nProbe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atRest === direct)
  }

  test("residual IVFPQ at-rest layout: pruned cells, code columns only, scan == at-rest") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = graft.core.Tables.read(spark, sf, "embeddings")
    val cent = e.filter(col("vec_id") < 8)
    val books = Similarity.pqTrainBooksResidual(e, cent,
      seedK = 16, 16, 1)
    val path = "target/atrest/ivfpqres-planshape"
    Similarity.ivfPqResidualWriteAtRest(e, cent, books, path)
    val df = Similarity.ivfPqResidualTopKAtRest(spark, path,
      e.filter(col("vec_id") < 2), cent, books, nProbe = 2, k = 10)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("ivfpqres-planshape")) => s
    }
    assert(scans.nonEmpty, "at-rest scan missing from the plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"no cell PartitionFilter: ${scan.partitionFilters}")
    val static = scan.partitionFilters
      .filterNot(_.toString.contains("dynamicpruning"))
    assert(scan.relation.location.listFiles(static, Nil).length <= 4,
      "scan reads unprobed cells")
    assert(!scan.schema.fieldNames.contains("embedding"),
      s"full vectors stored at rest: ${scan.schema.fieldNames.mkString(",")}")
    assert(scan.schema.fieldNames.count(_.startsWith("code_")) === 16,
      scan.schema.fieldNames.mkString(","))
    val atRest = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Similarity.ivfPqResidualTopKWith(e,
        e.filter(col("vec_id") < 2), cent, books, nProbe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atRest === direct)
  }

  test("no declared query plans an unbroadcast cartesian product") {
    // the blanket scale guard: a CartesianProduct in any declared
    // query's physical plan is a 100 TB killer. The broadcast-cross
    // ANN family (small query/anchor side crossed against the corpus)
    // is the one DELIBERATE exception — those must still be
    // broadcast-nested-loop, never a partitioned cartesian.
    val failures = Queries.queries.keys.toSeq.sorted.flatMap { name =>
      try {
        val p = Queries.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
        else None
      } catch {
        case e: Throwable => Some(s"$name: plan build failed: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("parallelism floors are FREE no-ops on already-spread inputs " +
      "(no inserted exchange, no gate-time job)") {
    import org.apache.spark.sql.functions.col
    // the r17 verdict's pipeline_intake_dump regression in miniature:
    // the spread gates probed df.rdd.getNumPartitions, and under AQE
    // that MATERIALIZES every intermediate query stage — each gate on
    // a post-shuffle input silently ran its whole upstream subtree as
    // a throwaway job. Pin both halves of the r18 fix: (1) an input
    // whose plan already shuffles comes back the SAME object (no
    // exchange added — the accessors pre-spread every declared path),
    // and (2) deciding that launches ZERO jobs.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    }
    val docsLike = graft.core.Tables.read(spark, sf, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val joined = docsLike.join(
      docsLike.select(col("doc_id")), "doc_id")
    spark.sparkContext.addSparkListener(listener)
    try {
      val gated = graft.core.Parallelism.spreadByKey(joined, col("doc_id"))
      assert(gated eq joined, "floor inserted an exchange on a spread input")
      // listener delivery is async; stage materialization inside the
      // gate would have SUBMITTED synchronously, so a short drain is
      // enough for its JobStart to surface
      Thread.sleep(1000)
      assert(jobs.get() === 0L,
        s"spread gate launched ${jobs.get()} job(s) — the AQE .rdd " +
          "materialization regression is back")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the floor still FIRES where it must: a raw single-split scan
    val raw = graft.core.Tables.read(spark, sf, "documents")
    val spreadRaw = graft.core.Parallelism.spreadByKey(raw, col("doc_id"))
    assert(!(spreadRaw eq raw),
      "floor no longer fires on an unsplit single-file scan")
  }
}
