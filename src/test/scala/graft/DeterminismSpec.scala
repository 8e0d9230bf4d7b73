package graft

import org.scalatest.funsuite.AnyFunSuite

/** Topology independence: results must be identical under different
  * shuffle parallelism — the property that makes local[32] results
  * transfer to a 1000-executor cluster. Exercises the exact-decimal
  * aggregation discipline (a plain double sum would fail this).
  */
class DeterminismSpec extends AnyFunSuite with SparkSpec {

  private val Sensitive = Seq(
    "q03_agg_pricing", "q10_star_join", "q12_window_lag_gap",
    "q24_churn_features", "q42_events_sessions", "q57_column_profile",
    // r4 additions: incremental dedup (hash window + index join), packing
    // (repartition + in-partition sort + stateful scan), tfidf (narrow
    // TF pass + DF join + per-doc window), mix weights (k-row windows)
    "q66_dedup_incremental", "q67_sequence_packing", "q63_tfidf_terms",
    "q71_mix_weights",
    // event analytics: funnel window chain, decimal RANGE frames,
    // islands, spine join, positional quantiles
    "q73_event_funnel", "q76_rolling_window", "q78_event_streaks",
    "q80_date_spine", "q81_exact_quantiles",
    // r6 additions: per-source ratio aggregates, fingerprint self-join,
    // driver-folded PQ training + ADC window chain, k-NN label
    // agreement over the candidate front end
    "q84_source_quality", "q85_cross_source_dups", "q86_pq_quantize",
    "q87_ann_ivfpq", "q88_label_agreement", "q89_label_noise",
    // r7 additions: simhash pair set + per-pair Jaccard verification
    // joins, per-source decode-health aggregate over real codec passes
    "q37_dedup_simhash", "q90_media_decode_health", "q91_index_health",
    // r8 addition: bucket-table health aggregate over the served index
    "q92_lsh_health",
    // r9 additions: the epoch-shuffle global rank must not depend on how
    // many range partitions the sort landed in (per-partition offsets
    // over a total order), nor the stratified quotas or z-scores on
    // aggregation partitioning
    "q100_epoch_shuffle", "q101_stratified_exact_k",
    "q102_event_rate_anomaly",
    // r9 sketches: CMS merge is count-additive (partition-independent);
    // MG candidates vary with partitioning but the rescored top-k must not
    "q103_cms_heavy_hitters", "q104_mg_topk",
    // r10 additions: full-outer snapshot diff, exact-state MV fold
    // (integer-cent sums — a double-cent fold would fail this), HLL
    // register merge (max-based, order-free), distributed bloom build
    // (per-partition filters OR-merged), bucketing agg, fixed-order
    // entropy summation
    "q105_snapshot_diff", "q106_incremental_mv", "q107_hll_distinct",
    "q108_bloom_join", "q109_seqlen_buckets", "q110_char_entropy",
    // r10 batch 2: global-rank percentiles (range partitions must not
    // leak into positions), hash-draw sampling, capped posting heads
    // (rank-limit per term), chi-square top-50 cut
    "q111_weighted_sample", "q112_quantile_norm", "q113_inverted_index",
    "q114_vocab_drift",
    // export-stage batch: curriculum positions from range-partitioned
    // global order, vocab rank cut, integer centroid/L2 chains
    // (double-milli sums would fail here), Pregel rank folds, exact
    // second moments
    "q131_threshold_sweep", "q132_curriculum_stages",
    "q134_vocab_contamination", "q136_label_centroids",
    "q137_centroid_purity", "q138_event_paths", "q139_scd2_history",
    "q140_pagerank", "q141_kmeans_step", "q142_cuped",
    "q143_exact_corr",
    // positional winsorization bounds and the contrastive rank windows
    // must not depend on which partition a tie landed in
    "q146_winsorize", "q147_contrastive_batch",
    // audit aggregates and the rank-sum metrics over the global order
    "q149_referential_integrity", "q150_benford_screen",
    "q151_gains_table", "q152_exact_auc",
    // diagnostics batch: the two-phase prefix-sum CDFs (q154) must not
    // leak range-partition boundaries into the cumulative counts; drift
    // bins, contingency marginals, triangle counts, skew ranks, KM risk
    // sets, and the z-test fold are all exact-integer reductions that
    // must survive any partitioning
    "q154_ks_statistic", "q155_psi_drift", "q156_chisq_cells",
    "q157_triangles", "q158_key_skew", "q159_km_survival",
    "q160_two_proportion",
    // behavior/time-series batch: three independent rank passes feed
    // one cube (q161), per-cohort running sums (q162), DECIMAL moment
    // folds (q163), and calendar-frame cumulative chains (q164/q165)
    "q161_rfm_segments", "q162_cohort_ltv", "q163_ols_by_group",
    "q164_cusum_changepoint", "q165_ewma_daily",
    // blocked fuzzy pairs, the rank-identity Gini fold, MI marginal
    // windows over the joint frame, and the range-frame trend window
    "q166_jw_name_match", "q167_revenue_gini", "q168_categorical_mi",
    "q169_seasonal_decomp",
    // max-register HLL unions and the same-key interval-filtered join
    "q170_sliding_hll", "q171_scd2_pit",
    // first-day classification, quintile rank bins, day-count histogram
    "q172_new_vs_returning", "q173_woe_iv", "q174_power_curve",
    // lag-window gaps, decimal square folds, two-phase prefix-sum ABC
    "q175_purchase_cadence", "q176_nation_hhi", "q177_abc_classes",
    // histogram-positional quartiles over a join; windowed moment folds
    "q178_leadtime_quartiles", "q179_rolling_corr",
    // bounded-heap partial aggregation must be merge-order-insensitive
    "q180_topk_heap",
    // the entropy accumulation is an ORDERED window fold — partition
    // count must not reorder the float chain
    "q181_behavior_entropy",
    // version-lead matrix cells and the selective pair join
    "q182_priority_transitions", "q183_dup_payments",
    // session flag folds and the sourcing-depth histogram
    "q184_browse_abandonment", "q185_single_sourcing",
    // integer list-price compares and the one-sample z marginals
    "q186_price_realization", "q187_late_shipment_z",
    // cohort normalization windows over the q74 build
    "q188_retention_curve",
    // calendar t-7 self-join and the marginal MAE window
    "q189_seasonal_naive",
    // r12 additions: the KMV bounded-heap k-mins and the merged union
    // must be merge-order-insensitive; the landmark BFS bit_or folds
    // are commutative integer ops per superstep; Kruskal-Wallis rank
    // sums ride the two-phase prefix sum (range partitions must not
    // leak into midranks); the stump argmin compares integer cross
    // products whose histogram can land in any partition layout; the
    // PCA gram partials fold per-partition and must merge to the same
    // matrix (and the driver iteration from it is then deterministic)
    "q241_kmv_distinct", "q242_landmark_bfs", "q243_kruskal_wallis",
    "q247_weighted_quartiles", "q249_stump_split", "q253_pca_power",
    // r13 additions: the rewritten Theil-Sen median (driver array path
    // must match regardless of how the daily fold partitioned); the
    // token-true packs' secondary-sort next-fit must not leak
    // partition layout into pack_seq; the KMV catalog's merged rollup
    // sketches are bounded-heap merges at every level; the fertility
    // fold is exact integer sums
    "q221_theil_sen", "q256_token_packing",
    "q257_token_packing_efficiency", "q258_kmv_catalog",
    "q259_tokenizer_fertility",
    // SemDeDup: integer centroid assignment + per-cluster successor
    // windows must not leak partition layout into the nn columns
    "q260_semdedup",
    // r13 batch 2: HITS propagates integer sums through two keyed
    // aggregates (the 128-bit a2 fold must merge identically under any
    // layout); the three classical tests fold conditional integer
    // moments / midranks whose partial aggregation order must not leak
    // into the terminal doubles
    "q261_hits_authority", "q262_welch_t", "q263_mcnemar",
    "q264_friedman", "q265_brown_forsythe",
    // the W1 CDF-gap walk is integer arithmetic on a domain-bounded
    // histogram; Cramér's V folds the χ² terms in a PINNED cell order
    // (an unpinned double fold would fail this)
    "q266_wasserstein_drift", "q267_cramers_v",
    // MRR's reciprocal fold and JT's tie-corrected moment folds are
    // pinned-order; the JT pair census is integer arithmetic on the
    // dense histogram grid
    "q268_ann_mrr", "q269_jonckheere",
    // log-rank: per-group risk sets from integer running sums over
    // the calendar-bounded duration frame, fold windows ordered by t
    "q270_logrank",
    // RBO's per-depth overlap counts + the ≤10-term pinned fold; MASE
    // folds the backtest errors in pinned day order
    "q271_ann_rbo", "q272_mase",
    // filtered ANN: the adaptive widening decision (over-fetch floor)
    // counts candidates per query — partition count must not change
    // which round serves a query, nor the pruned scan's row set
    "q273_ann_filtered",
    // graph-filtered: beam-widening decisions + the exact backstop cut
    // must be partition-invariant end to end
    "q274_ann_graph_filtered",
    // filtered IVF-PQ: probe-doubling decisions count qualifying ADC
    // candidates per query; the ADC pool cut and exact re-rank must be
    // partition-invariant
    "q275_ann_ivfpq_filtered",
    // filtered LSH: the multiprobe-widening decision (over-fetch floor
    // on distinct qualifying candidates) and the masked exact backstop
    // must be partition-invariant
    "q276_ann_lsh_filtered",
    // semantic decontamination: the (sim, -bid) max-struct argmax must
    // be merge-order-free (float MAX is order-independent, unlike a
    // float SUM) and the τ flag must not wobble across partitionings
    "q277_semantic_decontam",
    // filtered IVF on a non-label stored column: same widening
    // machinery as q273, plus the documents-joined lang attachment at
    // index build must not vary with partitioning
    "q278_ann_filtered_lang",
    // conjunctive two-column filtered LSH: multiprobe widening + masked
    // backstop under a sparse joint predicate, partition-invariant
    "q279_ann_lsh_filtered_multi")

  test("results are invariant under shuffle-partition count") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = SparkEntry.queries(name)(spark, Sf).collect()
          .map(_.toString).sorted.toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        val b = SparkEntry.queries(name)(spark, Sf).collect()
          .map(_.toString).sorted.toSeq
        assert(a == b, s"$name differs across partitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
