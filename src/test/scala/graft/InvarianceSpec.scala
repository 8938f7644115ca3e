package graft

/** Partition-layout invariance: the engine's exactness claims (integer-cents
  * money, deterministic tiebreaks, order-independent aggregation) mean a
  * registered query's OUTPUT may not depend on how the shuffle is laid out.
  * Run a representative slice of the registry at two very different
  * shuffle-partition counts (3 and 17 — both unlike the suite's 4) and
  * require bit-identical collected results. This is what guarantees the
  * DuckDB oracle comparison holds on a 1000-executor cluster, not just at
  * the gate's local partitioning. */
class InvarianceSpec extends SparkSpec {

  // one per aggregation family: partial/final sums (q01), windows (q08),
  // percentile histogram+window (q48), exact moments (q62), cohort matrix
  // (q90), sketch-prune+rescan (q93), pair generation + verify (q65)
  // ... plus the deterministic-sample family (q101 shuffle checksum, q102
  // bounded min-k sample): their md5-coin selections claim to be
  // layout-independent, so hold them to it
  // ... and the round-11 reconciliation/sketch family: hash-sum
  // checksums (q110), bounded k-min sketches (q116), drift micro-terms
  // (q111), merged partial states (q113), prefix-count ordinals (q118) —
  // each claims order-independent exactness, the precondition for
  // comparing their outputs across replicas/batches at all
  // ... and the iterative graph family (q119 integer PageRank, q122
  // plurality label propagation, q124 BFS levels) + the hashed classifier
  // (q121): iterative numerics are where partition-dependent float sums
  // or tie-breaks would first creep in, and their exactness claims are
  // the whole reason they can run under the hash gate
  private val queries = Seq("q01_agg", "q08_window_running",
    "q48_percentiles", "q62_stats_moments", "q90_retention",
    "q93_heavy_hitters", "q65_jaccard_prefix",
    "q101_epoch_shuffle", "q102_domain_cap",
    "q110_bucket_checksums", "q111_distribution_drift",
    "q113_incremental_agg", "q116_kmv_distinct", "q118_global_ordinals",
    "q119_pagerank", "q121_quality_classifier", "q122_label_propagation",
    "q124_bfs_distances",
    // q120's wedge enumeration depends on the degree orientation
    // internally, but the census it emits may not; q123's clusters,
    // q125's lift ranking, and q126's moments likewise claim
    // layout-independence
    "q120_triangles", "q123_entity_resolution", "q125_assoc_rules",
    "q126_degree_assortativity",
    // the session's sampling/merge/path claims: exact md5-coin stratified
    // quotas, MERGE conflict resolution, k-core peeling, OOV vocab
    // boundary ties, and journey tie-breaks are all layout-independent
    // by design
    "q127_kcore", "q128_oov_rate", "q129_stratified_sample",
    "q130_merge_upsert", "q132_user_journeys",
    "q133_pagerank_weighted", "q134_join_cardinality",
    "q135_anomaly_detection", "q136_trend_regression",
    // cascade-delete's closure and the winsorized value-histogram both
    // claim layout-independence (exact integer/set semantics)
    "q131_cascade_delete", "q137_winsorized_stats",
    // the split-leakage audit and the cluster-level split are exact
    // (prefix-join pairs + md5 coins + CC closure) at any layout
    "q138_split_leakage", "q139_cluster_split",
    // the perceptual-hash family: live decode + integer hashes + the
    // pigeonhole-exact banded join claim layout-independence outright
    "q141_image_dedup", "q142_incremental_image_dedup", "q143_audio_dedup",
    // the retrieval/fusion family: integer-exact RRF over deterministic
    // per-system ranks, and the label-filtered cosine ranking — both
    // claim layout-independent output outright
    "q144_hybrid_rrf", "q145_hard_negatives",
    // incremental index maintenance: modular set signatures and algebraic
    // merges claim layout-independence by construction
    "q146_incremental_index",
    // the curation trio: BPE argmax merges, winnowing min-selection and
    // the distributed skyline all claim exact layout-independent output
    // (skyline's local-pass pre-filter is provably lossless)
    "q147_bpe_train", "q148_winnowing", "q149_skyline", "q150_bpe_encode",
    // integer-exact coin thresholds: layout can't move a single keep
    "q151_temperature_mix",
    // ranks are fixed by the (key, id) total order, so the zipWithIndex
    // ordinals — and every window pair — survive any partitioning
    "q152_sorted_neighborhood",
    // two deterministic argmax trainings + a K-row comparison join
    "q153_bpe_drift",
    // md5 buckets + integer sums: the sketch is layout-free by algebra
    "q154_countmin",
    // salting redistributes the exchange, never the result
    "q155_salted_join",
    // deterministic planes + distinct candidates + rounded-cos rank
    "q156_hard_negatives_lsh",
    // fixed-point micros summed as BIGINTs; LEFT-join smoothing lookups
    "q157_bigram_lm",
    // pure-map canonicalization + one groupBy: layout-free by construction
    "q158_url_dedup",
    // integer score + value-histogram rank cut: exact at any layout
    "q159_percentile_gate",
    // integer jaccard + (jac4, u, v) total-order top-50
    "q160_node_jaccard",
    // composed funnel: every stage individually layout-free, and the
    // composition's population boundaries are set by deterministic keys
    "q161_curation_funnel",
    // weighted-quantile cut: integer token sums over the score domain
    "q162_token_budget",
    // pure-map bucket resolution + one integer groupBy
    "q163_length_buckets",
    // integer-milli centroid sums; cosine from exact integer inputs
    "q164_embedding_drift",
    // the crawl chain (r20): the admission walk is a pure map; the
    // frontier ranks ride the q152 zipWithIndex total-order claim
    // ((host, priority DESC NULLS LAST, ord) is a TOTAL order, so the
    // partition-offset ordinals are layout-free); the delta merge and
    // the canonical collapse are keyed exact semantics; the composed
    // funnel inherits all of the above
    "q185_sitemap_admission", "q186_frontier_schedule",
    "q187_sitemap_index", "q188_crawl_chain", "q189_frontier_delta",
    "q190_canonical_collapse")

  private def runAt(name: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // sorted: the invariance claim is about CONTENT (the md5-coin
    // selections), not row order — unordered registrations (q65 since
    // r11) legitimately emit partition-order rows, as the driver gate
    // sorts before hashing
    try SparkEntry.queries(name)(spark, SF).collect().map(_.toString).toSeq.sorted
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- queries)
    test(s"$q output is invariant to the shuffle partition count") {
      val a = runAt(q, 3)
      val b = runAt(q, 17)
      assert(a == b,
        s"$q differs between 3 and 17 shuffle partitions (${a.size}/${b.size} rows)")
      assert(a.nonEmpty)
      spark.catalog.clearCache()
    }
}
