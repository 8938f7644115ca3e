package graft

/** Physical-plan shape assertions: the properties that make these queries
  * survive a 100x scale-up are pinned here, so a regression that silently
  * de-broadcasts a dim join or un-pushes a filter fails the suite. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SF).queryExecution.executedPlan.toString

  test("q01 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // only the 5 referenced columns are read, not all 16
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"), p)
  }

  test("q02 dim chain is broadcast joins, no shuffle joins") {
    val p = plan("q02_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q03 fact-fact join is an equi hash join, never a nested loop") {
    // at sf0.001 Catalyst correctly auto-broadcasts the small side; the
    // invariant that holds at every scale is equi-join keys + no loop join
    val p = plan("q03_join_shuffle")
    assert(p.contains("Join [l_orderkey"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q04/q05 plan as semi/anti joins, not materialized subqueries") {
    assert(plan("q04_semi_join").contains("LeftSemi"), plan("q04_semi_join"))
    assert(plan("q05_anti_join").contains("LeftAnti"), plan("q05_anti_join"))
  }

  test("q12 global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q12_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01 aggregation is partial+final (map-side combine)") {
    val p = plan("q01_agg")
    assert(p.contains("partial_"), p) // HashAggregate(..., functions=[partial_...])
  }

  test("q39 scoring runs in whole-stage codegen with the native vec_dot") {
    val df = SparkEntry.queries("q39_knn_brute")(spark, SF)
    df.collect() // execute this exact plan so AQE finalizes it
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("vec_dot"), formatted)
    assert(formatted.contains("codegen id"), formatted) // whole-stage codegen spans
  }

  test("q67 centroid assignment is one native expression inside codegen") {
    // the codebook rides CentroidTopK as a reference object: C centroids
    // must appear as ONE expression node in ONE codegen span, never as C
    // inlined typedlit structs (which grow the generated method with C)
    val df = SparkEntry.queries("q67_knn_ivf")(spark, SF)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("centroid_topk"), formatted)
    assert(formatted.contains("codegen id"), formatted)
  }

  test("q82 JL projection is 24 native dots inside whole-stage codegen") {
    val df = SparkEntry.queries("q82_random_projection")(spark, SF)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("vec_dot"), formatted)
    assert(formatted.contains("codegen id"), formatted)
  }

  test("q73 benchmark probe broadcasts the eval gram set") {
    // the corpus-side gram stream must not shuffle to meet the (tiny)
    // benchmark set; contamination hits come from a broadcast hash join
    val p = plan("q73_decontamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q39 per-group top-k uses WindowGroupLimit (rank pushdown, no full materialization)") {
    val p = plan("q39_knn_brute")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q71 unpivot plans as a single-pass Expand, not a union of self-scans") {
    val p = plan("q71_unpivot")
    assert(p.contains("Expand"), p)
    // one scan of lineitem feeds the melt — a UNION ALL rewrite would show 3
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("pair-generation queries never degenerate to a cartesian") {
    // LSH/banding and the interval join keep an equi key under the
    // residual condition; only the explicitly-brute-force scoring passes
    // (q39's baseline, q144's vector side, q145's label-filtered scan,
    // and the unregistered embeddingPairsBrute verification function)
    // are allowed a broadcast nested loop over the broadcast query rows.
    for (q <- Seq("q22_range_join", "q36_minhash_lsh",
        "q37_simhash", "q64_neardup_lsh", "q65_jaccard_prefix",
        "q67_knn_ivf", "q96_incremental_dedup",
        "q138_split_leakage", "q139_cluster_split",
        "q141_image_dedup", "q142_incremental_image_dedup",
        "q143_audio_dedup", "q148_winnowing", "q152_sorted_neighborhood")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q158 canonicalization is map-side: one scan, exchanges only for the collapse") {
    // the canonical key is computed without any shuffle; the only
    // exchanges belong to the groupBy (two: count-distinct expands the
    // aggregate into a two-phase plan)
    val p = plan("q158_url_dedup")
    assert("FileScan".r.findAllIn(p).size == 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q159 thresholds broadcast back; windows run on the score domain") {
    val p = plan("q159_percentile_gate")
    // the corpus-side join must be broadcast (thresholds = one row per
    // source), never a shuffle of the scored corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // two windows (cumulative + per-source total), both over the
    // (source, score) histogram, not over rows
    assert(" Window".r.findAllIn(p).size == 2, p)
  }

  test("q157 LM lookup joins build on the fitted tables, stats broadcast") {
    val p = plan("q157_bigram_lm")
    // c12/c1 lookups and the per-source stats join keep the scored batch
    // on the streaming side — no sort of the batch anywhere at this scale
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q155 salted join stays on the shuffle path and equals the unsalted join") {
    // the hint must hold the merge path (a broadcast join needs no salt
    // — the demo would be vacuous), and salting must change the exchange
    // layout only: values identical to the plain join
    val p = plan("q155_salted_join")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q155_salted_join")(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Tables.events(spark, SF)
      .join(Tables.customer(spark, SF),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(Money.cents(col("value"))).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain, s"salted-only: ${salted -- plain}; plain-only: ${plain -- salted}")
  }

  test("q151 broadcasts its thresholds and keeps the keep-decision map-side") {
    // the corpus-volume side must never shuffle for the join: thresholds
    // (a handful of sources) broadcast, and the only exchanges are the
    // two aggregations (per-source counts, final rollup)
    val p = plan("q151_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q149 confines its dominance nested loop to the local-skyline candidates") {
    // the quadratic is DELIBERATE but must be (a) nested-loop over a
    // broadcast side (never a shuffled cartesian) and (b) fed by the
    // mapPartitions local-skyline pre-filter on BOTH sides, so it runs on
    // frontier candidates, not the corpus
    val p = plan("q149_skyline")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("SerializeFromObject".r.findAllIn(p).size >= 1, p)
  }

  test("q61 per-round minima are hash aggregates (partial+final), not windows") {
    // the round-2 regression: min().over(partitionBy(u)) shuffles a whole
    // component into one task at the fixpoint; the fix computes minima as
    // partial+final hash aggregates joined back. Pin the absence of Window
    // in the first round's plan.
    import org.apache.spark.sql.functions._
    val e = Tables.lineitem(spark, SF)
      .select(concat(lit("P"), col("l_partkey")).as("u"),
        concat(lit("S"), col("l_suppkey")).as("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val minL = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
    // min(string) buffers aren't hash-aggregable, so this plans as a
    // Sort/HashAggregate pair — either way it's a real aggregate exchange
    // with map-side partials, and crucially NOT a Window
    val p = sym.join(minL, "u").queryExecution.executedPlan.toString
    assert(p.contains("Aggregate"), p)
    assert(!p.contains("Window"), p)
    val full = SparkEntry.queries("q61_cc_dataframe")(spark, SF)
      .queryExecution.analyzed.toString
    assert(!full.contains("window"), "q61 must not plan any window operator")
  }

  test("q78 BM25 probe broadcasts every small side; the corpus shuffles only for tf") {
    // the inverted-index shape: query terms, df table, and corpus stats are
    // tiny and must ride broadcasts — the only corpus-sized exchange is the
    // (doc, term) tf aggregation itself
    val p = plan("q78_bm25")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // stats (one row) joins via a broadcast nested loop by construction —
    // that's a 1-row cross join, fine at any scale; what must NOT happen is
    // the qterms/dfreq joins degrading to SortMergeJoin of corpus data
    assert("SortMergeJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q76/q77 read only the columns they project") {
    val p76 = plan("q76_pii_redaction")
    assert(!p76.contains("doc_id"), p76) // only (lang, source, text) read
    val p77 = plan("q77_span_dedup")
    assert(!p77.contains("n_chars"), p77) // only (doc_id, text) read
  }

  test("q79 semdedup candidates come from an equi join on probed cells") {
    val p = plan("q79_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  private def windowExecs(name: String) =
    SparkEntry.queries(name)(spark, SF).queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }

  test("q80 packing never plans an unpartitioned window") {
    // the hierarchical running sum guarantees every window partition is
    // bounded (~PACK_FANOUT rows) at any corpus size; even the recursion
    // leaf declares an explicit constant key, so a WindowExec with an
    // EMPTY partition spec anywhere in the packing plan is a regression
    // to the single-partition global sort (the recursion itself is
    // equivalence-tested in TextAnalysisSpec)
    val wins = windowExecs("q80_shard_packing")
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "packing window lost its partition key")
  }

  test("q97 composed pipeline keeps the partitioned packing shape") {
    val wins = windowExecs("q97_curation_pipeline")
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "packing window lost its partition key")
    assert(!plan("q97_curation_pipeline").contains("CartesianProduct"))
  }

  test("q81 thresholds broadcast back to the corpus scan") {
    val p = plan("q81_mixture_balance")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q83 LM scoring joins word counts by key and broadcasts the stats") {
    val p = plan("q83_unigram_xent")
    assert(p.contains("BroadcastHashJoin"), p) // lang totals + lang stats
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p) // unigram counts map-side combine
  }

  test("q36 minhash signatures fold map-side: no aggregate computes the mins") {
    // the row-wise rewrite: signatures fold inside the scan projection
    // (one aggregate(...) HOF taking zip_with/least over the draw
    // slices), so the plan must contain no partial_min aggregation (the
    // old exploded path shuffled every (doc, word) row into a 32-min
    // groupBy)
    val p = plan("q36_minhash_lsh")
    assert(!p.contains("partial_min"), p)
    assert(p.contains("least"), p) // the in-row min fold
  }

  test("the shuffle-free simhash/repetition twins plan with zero aggregates") {
    // the row-wise variants exist for network-bound clusters: their whole
    // point is an aggregate-free plan (scan -> project), pinned here so a
    // refactor can't silently reintroduce an exchange
    val docs = Tables.documents(spark, SF)
    val p37 = graft.functions.Dedup.simhashRowwise(docs)
      .queryExecution.executedPlan.toString
    val p69 = graft.functions.TextAnalysis.repetitionRowwise(docs)
      .queryExecution.executedPlan.toString
    for (p <- Seq(p37, p69))
      assert(!p.contains("HashAggregate") && !p.contains("SortAggregate")
        && !p.contains("ObjectHashAggregate"), p)
  }

  test("q88-q92 analytics ops broadcast their small sides, no cartesians") {
    // q88: the (type x hour) spine join; q90: cohort sizes; q92: the fk
    // dimension anti joins — each must ride a broadcast. q89's stage
    // joins are user-keyed equi joins. q92's report is a union of 1-row
    // aggregates, so its only joins are the anti-join checks.
    for (q <- Seq("q88_resample", "q89_funnel", "q90_retention",
        "q91_span_removal", "q92_data_quality")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    assert(plan("q92_data_quality").contains("BroadcastHashJoin"),
      plan("q92_data_quality"))
  }

  test("q24 window aggregation prunes unused event columns") {
    val p = plan("q24_tumbling_window")
    assert(!p.contains("props"), p) // json column not read for this query
  }

  test("q102 domain cap plans the bounded aggregator, never a domain window") {
    // the design claim: a mega-domain contributes <=K candidates per
    // partition through MinKByCoin's partial buffers — a WindowExec here
    // would mean the query regressed to sorting whole domains through
    // single partitions
    assert(windowExecs("q102_domain_cap").isEmpty,
      "domain cap regressed to a window sort")
    val p = plan("q102_domain_cap")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_"), p)
  }

  test("q101 epoch shuffle's only window is partitioned by shard") {
    val wins = windowExecs("q101_epoch_shuffle")
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "epoch shuffle lost its shard partition key")
  }

  test("q100/q103 aggregate with map-side combine and no cartesian blowup") {
    val p100 = plan("q100_inverted_index")
    assert(p100.contains("partial_"), p100)
    assert(!p100.contains("CartesianProduct"), p100)
    val p103 = plan("q103_pmi_collocations")
    // the only product is the broadcast one-row stats frame
    assert(!p103.contains("CartesianProduct"), p103)
    assert(p103.contains("TakeOrderedAndProject"), p103)
  }

  test("q104 phrase search broadcasts the phrase dim, never self-joins postings") {
    // the design claim: multi-term adjacency is ONE broadcast equi join
    // plus aggregation on the alignment key — a SortMergeJoin or product
    // here would mean the postings relation is being shuffled or
    // self-joined per phrase term
    val p = plan("q104_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p)
  }

  test("q125-q131 analytics ops broadcast their small sides and avoid windows") {
    // q125: pair generation is a keyed self-join per basket + partial
    // aggs; the only nested-loop product is the broadcast one-row total
    val p125 = plan("q125_assoc_rules")
    assert(!p125.contains("CartesianProduct"), p125)
    assert(p125.contains("TakeOrderedAndProject"), p125)
    assert(p125.contains("partial_count"), p125)
    // q128/q129: vocab and quota tables broadcast back to the corpus —
    // a SortMergeJoin here would mean the bounded side is shuffling the
    // whole corpus
    for (q <- Seq("q128_oov_rate", "q129_stratified_sample")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // q129's whole point: no per-stratum window rank anywhere
    assert(!plan("q129_stratified_sample").contains("Window"),
      "q129 must not plan a stratum window")
    // q130/q131: keyed joins only; the MERGE pass may not degenerate to
    // a product, and the cascade is semi joins
    for (q <- Seq("q130_merge_upsert", "q131_cascade_delete")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("Window"), s"$q:\n$p")
    }
  }

  test("q119/q120 loop stages are keyed joins + partial aggregates, no windows") {
    // The registered frames are materialized (localCheckpoint truncates
    // their lineage so the pinned loop blocks can be released), so the
    // shape claims are pinned on the loop stages built the way the
    // operators build them.
    import org.apache.spark.sql.functions._
    // one PageRank round: contribution sum must be a hash aggregate with
    // map-side partials on an equi join — a Window or a product here
    // would concentrate a hub's in-edges into one task
    val e = Tables.lineitem(spark, SF)
      .select(col("l_partkey").cast("long").as("src"),
        (col("l_suppkey").cast("long") + 1000000L).as("dst"))
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val contrib = deg.select(col("v").as("src"), expr("d * 0 + 1").as("c"))
    val round = e.join(contrib, "src")
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    val pr = round.queryExecution.executedPlan.toString
    assert(pr.contains("partial_sum"), pr)
    assert(!pr.contains("Window"), pr)
    assert(!pr.contains("CartesianProduct"), pr)
    assert(!pr.contains("BroadcastNestedLoopJoin"), pr)
    // the triangle wedge closure: both the wedge join and the closing
    // join stay equi joins on vertex keys
    val pairs = e.select(col("src").as("u"), col("dst").as("v")).distinct()
    val ori = pairs.withColumn("rb", col("v"))
    val wl = ori.select(col("u").as("a"), col("v").as("wa"), col("rb").as("ra"))
    val wr = ori.select(col("u").as("a"), col("v").as("wb"), col("rb").as("rw"))
    val tri = wl.join(wr, Seq("a")).filter(col("ra") < col("rw"))
      .select(col("wa").as("a"), col("wb").as("b"))
      .join(ori.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"))
      .agg(count(lit(1)).as("n"))
    val pt = tri.queryExecution.executedPlan.toString
    assert(!pt.contains("CartesianProduct"), pt)
    assert(!pt.contains("BroadcastNestedLoopJoin"), pt)
    assert(!pt.contains("Window"), pt)
    assert(pt.contains("partial_count"), pt)
  }

  test("q190 canonical collapse is extraction maps + ONE aggregate, no joins or windows") {
    // the collapse's scale claim: parse, key derivation and the argmin
    // encoding are all map work; the only exchange is the partial+final
    // groupBy on the canonical key — the same budget as q158
    val p = plan("q190_canonical_collapse")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p) // map-side combine on the collapse
  }

  test("q189 frontier delta: keyed merge + de-skewed schedule, no windows or cartesians") {
    // the state merge is ONE keyed full-outer join; the schedule is the
    // q186 construction (range sort + offset ordinals, PlanSpec-adjacent
    // pin lives in SitemapSpec); nothing may plan a per-host Window or
    // any cartesian product
    val p = plan("q189_frontier_delta")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer"), p)
    graft.Caches.release()
  }
}
