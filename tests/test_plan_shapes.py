"""Physical-plan regression tests: the optimizations SURVEY.md §4.2 relies
on must actually appear in the plans (a correct-but-shuffling plan is a
perf bug at 100 TB, not a style issue)."""

from __future__ import annotations

from detector_network_processor_spark.plans import all_queries

from conftest import SF_DIR


def plan_of(spark, name, execute=False):
    df = all_queries()[name].fn(spark, SF_DIR)
    if execute:  # AQE finalizes (and codegen appears) only after execution
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_customer_dim(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_join_broadcast_parts_is_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_parts")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_pushes_filter_to_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_prunes_columns(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # only the 7 needed columns reach the scan — no l_orderkey/l_partkey/...
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_band_join_is_hash_not_cartesian(spark):
    plan = plan_of(spark, "coincidence_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_whole_stage_codegen(spark):
    plan = plan_of(spark, "q1_pricing_summary", execute=True)
    # under AQE, whole-stage-codegen spans are the "*(n)" markers
    assert "*(" in plan


def test_embedding_near_dup_no_all_pairs_join(spark):
    """The cosine-threshold self-join must run as pivot-pruned equi-joins
    (cells keyed by pivot-pair), never as a full-table broadcast
    nested-loop — the r2-flagged O(n²)-broadcast plan cannot ship at
    100 TB (operators/similarity.py::cosine_threshold_join)."""
    plan = plan_of(spark, "embedding_near_dup", execute=True)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the cell scorer is an Arrow-batched grouped-map stage
    assert "FlatMapGroupsInPandas" in plan


def test_curation_pipeline_composes_without_cartesian(spark):
    """The composed pipeline must keep the benchmark side broadcast and
    never degrade a stage boundary into a cartesian/NLJ."""
    plan = plan_of(spark, "curation_pipeline")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_quality_broadcasts_model(spark):
    """LM scoring joins the corpus against the per-lang bigram model —
    the model is the small side and must broadcast (a shuffle join here
    would re-shuffle the full exploded corpus at 100 TB)."""
    plan = plan_of(spark, "lm_quality_scores")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_top_k_is_window_group_limit(spark):
    """The rank<=k filter must rewrite to WindowGroupLimit (per-partition
    top-k pushdown) so only k rows per query survive each shuffle side —
    full ranking of every matching doc would be the scale bug."""
    plan = plan_of(spark, "bm25_search")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_bm25_posting_join_broadcasts_query_terms(spark):
    plan = plan_of(spark, "bm25_search")
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_is_map_only_before_sort(spark):
    """Chunking must be explode-over-sequence in one stage: no join, no
    aggregation — a single Exchange only for the presentation sort."""
    plan = plan_of(spark, "chunk_documents")
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_funnel_has_no_cartesian_on_event_side(spark):
    """The funnel cascade must stay hash-join + hash-agg; the only
    broadcast-nested-loop allowed is the final 1-row denominator join."""
    plan = plan_of(spark, "funnel_conversion")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_gap_fill_spine_is_per_key_sequence(spark):
    """Gap-fill must generate the spine by exploding one sequence per key —
    never a cross join against a global calendar table."""
    plan = plan_of(spark, "gap_fill_locf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_merge_upsert_single_full_outer_join(spark):
    plan = plan_of(spark, "merge_upsert")
    assert plan.count("FullOuter") == 1
    assert "CartesianProduct" not in plan


def test_pq_scoring_broadcasts_query_luts(spark):
    """PQ candidate scoring must broadcast the tiny per-query LUT table;
    the corpus code table is never re-shuffled before the top-k window."""
    plan = plan_of(spark, "pq_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_retention_distincts_before_cohort_join(spark):
    plan = plan_of(spark, "retention_cohorts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sink_formatters_are_map_only(spark):
    """K1/K2 formatters are pure column expressions: over an already-built
    summary frame they add NO exchange — the formatting pipeline is
    map-only at any scale (streaming/sinks.py §Non-L1 formatters)."""
    import pyspark.sql.functions as F

    from detector_network_processor_spark.streaming.sinks import (
        summary_influx_points,
        summary_text_lines,
    )

    summary = spark.range(10).select(
        F.col("id").alias("hash"),
        F.lit(1).alias("win"),
        F.lit(5).alias("incoming"),
        F.lit(6).alias("ublox_counter_progress"),
        F.lit(0.1).alias("deadtime"),
        F.lit(1.0).alias("mean_pulselength"),
        F.lit(2.0).alias("mean_time_acc"),
        F.lit(0.5).alias("rate_mean"),
        F.lit(0.1).alias("rate_std"),
        F.lit("u").alias("user"),
        F.lit("s").alias("station_id"),
        F.lit(0).alias("ts_us"),
    )
    for out in (summary_text_lines(summary), summary_influx_points(summary)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_pair_uptime_interval_join_is_broadcast(spark):
    """pair_uptime's interval-overlap self-join must broadcast the
    dimension-sized interval table — a shuffled or nested-loop plan over
    the station dimension is fine, but no full-data exchange may appear
    beyond the lifecycle replay itself."""
    plan = plan_of(spark, "pair_uptime")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_detector_log_influx_single_aggregate(spark):
    """One point per log assembly = exactly one hash aggregate pair
    (partial + final) over the EAV rows; no joins, no windows."""
    plan = plan_of(spark, "sink_detector_log_influx")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("HashAggregate") == 2 or "SortAggregate" in plan


def test_dsir_model_join_is_broadcast(spark):
    """DSIR's log-ratio model table is O(K buckets) and must ride a
    broadcast join onto the per-doc features — a shuffled model join would
    needlessly reshuffle the corpus-sized side."""
    plan = plan_of(spark, "dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_spatial_join_is_cell_bucketed(spark):
    """stations_within_range must plan as an equi-join on grid-cell keys —
    never the all-pairs theta join its oracle runs."""
    plan = plan_of(spark, "stations_within_range")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_pq_train_codebook_broadcasts_centroids(spark):
    """Each Lloyd assignment joins the corpus against the 4x16-code
    centroid table — that table must broadcast; the corpus never
    reshuffles for it."""
    plan = plan_of(spark, "pq_train_codebook")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_duplicate_span_ranges_no_cartesian(spark):
    """Span detection = inverted-index equi-join + windows; no pair
    explosion anywhere."""
    plan = plan_of(spark, "duplicate_span_ranges")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bpe_tokenize_broadcasts_vocab(spark):
    """The learned-vocabulary join back onto the doc stream must broadcast
    the word dimension — re-shuffling the corpus for a vocab lookup is the
    anti-pattern at 100 TB."""
    plan = plan_of(spark, "bpe_tokenize")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_documents_scan_prunes_unused_columns(spark):
    """text_quality never touches `source` — column pruning must reach the
    parquet reader (a scan fetching all columns for a projection is wrong)."""
    df = all_queries()["text_quality"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "source" not in read_schema, read_schema


def test_dsir_approx_path_has_no_global_window(spark):
    """The exact_rank=False scale path must not contain a global (single-
    partition) Window or the SinglePartition exchange that feeds it — the
    whole point of the flag is removing the one scale-killer construct
    (VERDICT r4 'What's wrong' #2)."""
    from detector_network_processor_spark.plans.curation import dsir_importance_plan

    df = dsir_importance_plan(spark, SF_DIR, exact_rank=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    # the exact path keeps the Window (oracle mode) — sanity that the flag
    # actually switches plans
    exact = dsir_importance_plan(spark, SF_DIR, exact_rank=True)
    assert "Window" in exact._jdf.queryExecution().executedPlan().toString()


def test_dsir_approx_selects_about_keep_pct(spark):
    """approx path: selected fraction lands near KEEP_PCT and every
    selected doc outranks (w6-wise) every unselected one up to t-digest
    error — and the two modes agree on the weight values exactly."""
    from detector_network_processor_spark.plans.curation import (
        _DSIR_KEEP_PCT,
        dsir_importance_plan,
    )

    approx = dsir_importance_plan(spark, SF_DIR, exact_rank=False).collect()
    n = len(approx)
    k = sum(1 for r in approx if r["selected"])
    # t-digest accuracy 10000 on a few hundred docs → exact in practice,
    # allow a small band anyway
    assert abs(k - n * _DSIR_KEEP_PCT / 100.0) <= max(3, 0.02 * n)
    exact = {
        r["doc_id"]: r
        for r in dsir_importance_plan(spark, SF_DIR, exact_rank=True).collect()
    }
    assert set(exact) == {r["doc_id"] for r in approx}
    for r in approx:
        assert exact[r["doc_id"]]["log_weight"] == r["log_weight"]


def test_winnowing_is_map_only_until_distinct(spark):
    """Winnowing fingerprint extraction is a per-document array kernel —
    no join anywhere; the only shuffle allowed is the final DISTINCT on
    the fingerprint dimension."""
    plan = plan_of(spark, "winnowing_fingerprints")
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


def test_rrf_fusion_windows_are_per_query(spark):
    """The fusion re-rank must never sort the corpus globally — quality is
    ranked within per-query candidate sets only (no SinglePartition
    exchange feeding a Window)."""
    plan = plan_of(spark, "rrf_fusion")
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_station_communities_broadcasts_labels(spark):
    """Each LPA iteration joins the O(stations) label table onto the edge
    list — that join must broadcast; re-shuffling edges per iteration is
    the anti-pattern at graph scale."""
    plan = plan_of(spark, "station_communities")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_broadcasts_flagged_grams(spark):
    """The flagged boilerplate-gram set (high-DF tail, small by
    construction) must broadcast back onto the per-doc gram counts — a
    sort-merge join there would re-shuffle the whole gram stream."""
    plan = plan_of(spark, "boilerplate_ngrams")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_recall_eval_no_global_sort(spark):
    """Recall evaluation joins two per-query top-k tables — no cartesian
    product and no single-partition window may appear (the rankings are
    per-query, the comparison is an equi-join)."""
    plan = plan_of(spark, "ann_recall_eval")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_dedup_survivorship_no_cartesian(spark):
    plan = plan_of(spark, "dedup_survivorship")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ccnet_approx_path_has_no_window(spark):
    """The CCNet bucketing scale path must not sort the doc dimension —
    thresholds come from approx_percentile, bucketing is a broadcast
    comparison (same contract as the dsir approx path)."""
    from detector_network_processor_spark.plans.llm import ccnet_ppl_buckets_plan

    df = ccnet_ppl_buckets_plan(spark, SF_DIR, exact=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_ccnet_exact_and_approx_agree_on_interior_docs(spark):
    """Exact ntile and approx-threshold bucketing agree except possibly at
    tertile boundaries; with 3 langs x hundreds of docs the disagreement
    set must be a small fraction."""
    from detector_network_processor_spark.plans.llm import ccnet_ppl_buckets_plan

    exact = {r.doc_id: r.bucket for r in ccnet_ppl_buckets_plan(spark, SF_DIR, exact=True).collect()}
    approx = {r.doc_id: r.bucket for r in ccnet_ppl_buckets_plan(spark, SF_DIR, exact=False).collect()}
    assert exact.keys() == approx.keys()
    diff = sum(1 for d in exact if exact[d] != approx[d])
    assert diff <= len(exact) * 0.05, f"{diff}/{len(exact)} bucket disagreements"


def test_station_triangles_no_cartesian(spark):
    plan = plan_of(spark, "station_triangles")
    assert "CartesianProduct" not in plan


def test_star_edges_have_no_self_join(spark):
    """lsh_star_edges derives bucket spanning stars with ONE shuffle on the
    bucket key (window min) — no band-rows self-join anywhere. The full
    within-bucket pairing (minhash_lsh_pairs) is exactly what this plan
    must NOT contain: its per-bucket edge volume is quadratic under clone
    duplication."""
    from detector_network_processor_spark.operators.dedup import (
        lsh_star_edges,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = lsh_star_edges(minhash_signatures(docs, portable=True), portable=True)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_substring_dedup_spans_joins_on_fingerprint_only(spark):
    """The composed substring-dedup pipeline must stay on the fingerprint
    dimension: a semi-join on fp (shared-fingerprint filter) is the ONLY
    join; windows are per-document; no doc-pair all-pairs anywhere."""
    plan = plan_of(spark, "substring_dedup_spans")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan, plan


def test_substring_dedup_rewrite_no_token_explode(spark):
    """The rewrite stage excises spans with a higher-order array filter on
    the intact text column: no Explode of the corpus into token rows, no
    Python evaluation, and the span side reaches the corpus through one
    doc-keyed equi-join (no cartesian)."""
    plan = plan_of(spark, "substring_dedup_rewrite")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the only Generate (explode) allowed is the fingerprint extraction's;
    # the documents->tokens path must NOT explode, so every Generate in the
    # plan emits the fingerprint struct, never a token string column
    for seg in plan.split("Generate ")[1:]:
        assert "pos" in seg[:200] or "fp" in seg[:200], seg[:200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jaccard_per_doc_joins_carry_no_broadcast_hint(spark):
    """The per-doc size/meta tables in the jaccard family are O(n_docs)
    rows: a forced F.broadcast hint on them ERRORS past Spark's 8 GB
    broadcast hard limit (~300 M docs) instead of degrading to a shuffle
    join. The plans must leave the choice to AQE — the only hint allowed
    is the capped path's hot-shingle set, whose size is bounded by
    shingles_per_doc / CAP_FRAC rows independent of corpus size."""
    from detector_network_processor_spark.plans import all_queries

    exact = all_queries()["near_dup_jaccard"].fn(spark, SF_DIR)
    analyzed = exact._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # exact path: zero forced hints
    # AQE still broadcasts the small side on its own at this SF
    assert "BroadcastHashJoin" in plan_of(spark, "near_dup_jaccard")

    capped = all_queries()["near_dup_jaccard_capped"].fn(spark, SF_DIR)
    analyzed = capped._jdf.queryExecution().analyzed().toString()
    # exactly one hint: the bounded hot-set anti-join (checkpoints truncate
    # the analyzed plan, so count what remains visible upstream of them)
    assert analyzed.count("ResolvedHint") <= 1
