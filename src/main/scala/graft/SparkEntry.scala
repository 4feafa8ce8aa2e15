package graft

import graft.core.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query
  * over the `/root/testdata/sf*` parquet tables, with (where SQL can
  * express it) an equivalent DuckDB oracle statement. Column names and
  * values are constructed to hash-match the oracle exactly (see
  * [[graft.functions.Exact]] for the float-determinism strategy).
  *
  * Query registries live per domain under [[graft.queries]]; this object
  * just merges them.
  */
object SparkEntry {

  private def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    graft.queries.RelationalQueries.registry ++ graft.queries.ExtensionQueries.registry ++
      graft.queries.IoQueries.registry ++ graft.queries.MlQueries.registry ++
      graft.queries.OlapQueries.registry ++ graft.queries.EtlQueries.registry ++
      graft.queries.ScaleQueries.registry ++ graft.queries.TimeSeriesQueries.registry ++
      graft.queries.GraphQueries.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.PricingSummary(Catalog(spark, "/root/testdata/sf0.001").lineitem)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get the driver's weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }

  /** Driver-consumable twin map (the r16 verdict's item 1): every
    * registered query that ships WITHOUT an oracle — the inherently
    * seeded/iterative ML *product* paths, whose cluster ids / tree
    * splits / factor matrices depend on Spark ML's seeded sampling and
    * are not SQL-replayable by design (SURVEY §2.10 argument, held
    * since r12) — maps here to its hash-gated deterministic TWIN: the
    * same reference behavior re-derived with exact arithmetic that
    * DuckDB replays end-to-end (integer-grid Lloyd for the KMeans
    * pipeline, a depth-2 exact tree for the RF pipeline, a rank-2
    * closed-form implicit ALS for the recommender). A driver can score
    * a `no_oracle` gate as covered iff `twinOf(gate)` is hash-green in
    * the same round — zero driver-side design work beyond reading
    * `twin_of.json` (written by [[Verify]] next to `oracle_sql.json`).
    * Invariants (pinned in VerifySpec): keys are exactly the registered
    * queries with no oracle entry, and every value is a registered,
    * oracle-backed query. (`ml_model_roundtrip` left this set in r17:
    * its output is deterministic by the persistence contract, so it
    * carries a full oracle of its own.)
    */
  def twinOf: Map[String, String] = Map(
    "ml_kmeans_segmentation" -> "ml_kmeans_lloyd",
    "ml_churn_rf" -> "ml_churn_twin",
    "ml_als_recommend" -> "ml_als_twin")

  /** Headline benchmark set: the query workload (scans, joins, aggs,
    * windows, dedup, text, vectors, events). ML *fits* are excluded —
    * they are iterative training jobs, not queries, and are exercised by
    * Verify + tests.
    */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q2_filter_project", "q3_join_agg", "q4_derive",
    "q5_window_first", "q6_topk", "q7_repurchase", "q8_band_join",
    "q9_rfm", "q10_cohort_rates", "q11_dedup_keys", "q12_left_join_fill",
    "q13_set_ops", "q14_semi_join", "q15_anti_join", "q16_null_scan",
    "q17_global_agg", "q18_collect_set", "q19_explode_tokens",
    "d1_dedup_exact", "d2_minhash_signatures", "d3_minhash_pairs",
    "d4_ngram_jaccard", "d5_simhash", "d6_simhash_pairs", "d7_embedding_dups",
    "d8_dup_clusters", "d9_decontaminate", "d10_span_dedup", "d11_span_removal",
    "d12_incremental_dedup", "d13_fuzzy_join", "d14_containment",
    "c1_corpus_pipeline", "c2_corpus_filter_first", "c3_mixture_sample",
    "c4_pack_sequences", "c5_mixture_epochs", "c6_training_write", "c7_curriculum",
    "s1_ann_brute", "s2_ann_lsh", "s3_ann_ivf", "s4_ann_recall", "s5_ann_ivf_fixed",
    "s6_ann_pq", "s7_ann_ivfpq", "s8_ann_filtered",
    "t1_token_counts", "t2_quality", "t3_langid", "t4_fingerprint", "t5_hash_split",
    "t6_repetition", "t7_pii_redact", "t8_vocab", "t9_bpe_tokens",
    "t10_quality_model", "t11_stratified_take", "t12_countmin", "t13_tfidf",
    "t14_bloom", "t15_hll", "t16_chi2_drift", "t17_ks_drift", "c4b_pack_bpe",
    "mm1_multimodal", "mm2_frame_sample", "mm3_real_decode",
    "e1_hourly_events", "e2_sessionize", "e3_session_window", "e4_stateful_totals",
    "e5_stateful_sessions", "e6_stream_stream_join", "e7_stream_file_sink",
    "e8_stream_dedup", "e9_stream_static_join", "e10_stream_restart",
    "e11_sliding_windows", "e12_stream_outer_join",
    "q20_csv_roundtrip", "q21_partitioned_roundtrip", "q36_orc_roundtrip",
    "q39_sink_roundtrip", "q40_partition_upsert", "q41_range_layout",
    "q42_inferred_csv", "q43_local_source", "q46_zorder_layout", "q47_merge_upsert",
    "q22_rollup", "q23_cube", "q44_clean_columns", "q45_pivot",
    "q51_unpivot", "q52_grouping_sets", "q53_trailing_window", "q54_ab_test",
    "q55_exact_stats", "q56_funnel", "q57_scd2_merge", "q59_global_index",
    "q60_incremental_agg", "q61_quantile_bins", "q62_full_outer",
    "q24_window_frames", "q25_sql_api", "q48_asof_join", "q63_sliding_distinct",
    "q49_resample_ffill", "q50_scd2_intervals", "q58_interval_join", "g1_pagerank",
    "g2_triangles", "g3_bfs_hops", "g4_label_prop", "g5_triangles_capped",
    "q26_json_props", "q27_pick_per_group", "q28_percentiles",
    "q29_string_funcs", "q30_date_arith",
    "q31_etl_transactions", "q32_etl_weekly", "q33_etl_customer", "q34_etl_item",
    "q35_coupon_flag", "ml_fpgrowth_pairs", "ml_kmeans_lloyd", "ml_churn_twin",
    "ml_als_twin", "ml_kmeans_autok",
    // layout queries last: q37 replicates its build side 8x and q38
    // writes two bucketed warehouse tables inside the measured window —
    // nothing should run downstream of their footprint
    "q37_skew_join", "q38_bucketed_join")
}
