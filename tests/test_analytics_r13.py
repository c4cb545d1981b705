"""Semantic tests for the r13 analytics additions — properties the
oracle hash cannot express (equivalence of the distributed skyline to
the quadratic dominance definition on adversarial data, mode tie
determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpx_etl_spark.queries import load_registry

QUERIES, _ = load_registry()


def _naive_skyline(pairs):
    """Quadratic dominance reference: (price, size) survives iff no
    other point has price<=, size>= with one strict."""
    out = []
    for i, (p, s) in enumerate(pairs):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s))
            for j, (q, t) in enumerate(pairs)
            if j != i
        )
        if not dominated:
            out.append((p, s))
    return sorted(set(out))


def test_skyline_matches_naive_dominance(spark, sf_dir):
    res = QUERIES["q_skyline_pareto"](spark, sf_dir)
    got = sorted({(r["price"], r["size"]) for r in res.collect()})
    from cpx_etl_spark.sources import load_table

    part = load_table(spark, sf_dir, "part")
    pairs = [
        (r["p_retailprice"], r["p_size"])
        for r in part.select("p_retailprice", "p_size").collect()
    ]
    assert got == _naive_skyline(pairs)


def test_skyline_distributed_pruning_on_adversarial_frames(spark):
    """The two-phase (range-partition + cross-partition prefix max)
    formulation must agree with the quadratic definition on frames
    engineered to stress partition boundaries: a strictly ascending
    staircase (every point on the skyline), a strictly descending one
    (only the first survives), all-equal points, and same-price
    multi-size clusters."""
    from cpx_etl_spark.queries.relational import q_skyline_pareto

    cases = [
        # staircase up: price up, size up -> every point survives
        [(float(i), i) for i in range(100)],
        # staircase down: cheapest has biggest size -> one survivor
        [(float(i), 100 - i) for i in range(100)],
        # all identical: mutually non-dominating
        [(5.0, 7)] * 16,
        # same-price clusters: only the max size per price can survive
        [(float(i // 8), i % 8) for i in range(128)],
    ]
    import os
    import tempfile

    for pts in cases:
        with tempfile.TemporaryDirectory() as d:
            part = spark.createDataFrame(
                [
                    (i, f"part{i}", "B", "T", s, p)
                    for i, (p, s) in enumerate(pts)
                ],
                "p_partkey long, p_name string, p_brand string,"
                " p_type string, p_size int, p_retailprice double",
            )
            part.write.parquet(os.path.join(d, "part.parquet"))
            got = sorted(
                {
                    (r["price"], r["size"])
                    for r in q_skyline_pareto(spark, d).collect()
                }
            )
            assert got == _naive_skyline(pts), pts[:4]


def test_mode_tie_breaks_to_lexically_smallest(spark, tmp_path):
    """Equal counts must resolve to the lexically smallest segment —
    the determinism contract the oracle relies on."""
    import os

    from cpx_etl_spark.queries.relational import q_mode_per_group

    d = str(tmp_path)
    cust = spark.createDataFrame(
        [(1, "ZEBRA", 0), (2, "APPLE", 0), (3, "APPLE", 1), (4, "ZEBRA", 1)],
        "c_custkey long, c_mktsegment string, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "ALPHA", 0), (1, "BETA", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    cust.write.parquet(os.path.join(d, "customer.parquet"))
    nation.write.parquet(os.path.join(d, "nation.parquet"))
    rows = {
        r["nation"]: r["modal_segment"]
        for r in q_mode_per_group(spark, d).collect()
    }
    assert rows == {"ALPHA": "APPLE", "BETA": "APPLE"}


def test_knn_graph_invariants(spark, sf_dir):
    """Structural invariants of the kNN graph: per-vector neighbor
    lists are distinct and ordered by descending cosine, mutual edges
    come in pairs (the global mutual count is even), and mutual_cnt
    never exceeds the out-degree."""
    rows = QUERIES["q_knn_graph"](spark, sf_dir).collect()
    total_mutual = 0
    for r in rows:
        nbrs = [n for n in (r["n1"], r["n2"], r["n3"]) if n is not None]
        assert len(set(nbrs)) == len(nbrs)
        assert r["vec_id"] not in nbrs
        coss = [c for c in (r["c1"], r["c2"], r["c3"]) if c is not None]
        assert coss == sorted(coss, reverse=True)
        assert 0 <= r["mutual_cnt"] <= len(nbrs)
        total_mutual += r["mutual_cnt"]
    assert total_mutual % 2 == 0 and total_mutual > 0


def test_markov_attribution_invariants(spark, sf_dir):
    """Removal can only delete conversion paths (T entries are only
    zeroed), so every removal effect is in [0, 1], removal_conv never
    exceeds base_conv, and the shares are a proper normalization."""
    rows = QUERIES["q_markov_attribution"](spark, sf_dir).collect()
    assert len(rows) == 4
    base = rows[0]["base_conv"]
    assert 0 < base <= 1
    share_sum = 0.0
    for r in rows:
        assert r["base_conv"] == base
        assert 0 <= r["removal_conv"] <= base + 1e-9
        assert 0 <= r["removal_effect"] <= 1
        share_sum += r["attribution_share"]
    assert abs(share_sum - 1.0) < 1e-4


def test_itemsets3_prune_is_lossless(spark, sf_dir):
    """Downward closure + adaptive threshold (r14 semantics: BRAND
    baskets, final keep = above-average support among repeated
    triples): the Apriori-pruned result must equal the naive
    all-triples count recomputed here without pruning, thresholded by
    the same m = max(2, ceil(avg))."""
    import math

    from cpx_etl_spark.sources import load_table

    got = {
        (r["p1"], r["p2"], r["p3"], r["support"])
        for r in QUERIES["q_itemsets3"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bk = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    ).distinct()
    baskets = {}
    for r in bk.collect():
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    from collections import Counter
    from itertools import combinations

    naive = Counter()
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            naive[t] += 1
    rep = {t: n for t, n in naive.items() if n >= 2}
    assert rep, "fixture corpus must contain repeated brand triples"
    m = max(2, math.ceil(sum(rep.values()) / len(rep)))
    want = {(a, b, c, n) for (a, b, c), n in rep.items() if n >= m}
    assert got == want and len(got) > 0


def test_char_entropy_analytic_cases(spark, tmp_path):
    """Uniform text over 2^k distinct characters has entropy exactly k
    bits; a constant character has entropy 0."""
    import os

    from cpx_etl_spark.queries.text import q_char_entropy

    d = str(tmp_path)
    docs = spark.createDataFrame(
        [
            (1, "abcdefgh" * 4, "en", "uniform8", 32),
            (2, "aaaaaaaa", "en", "const", 8),
            (3, "ab" * 16, "en", "uniform2", 32),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    rows = {
        r["source"]: r for r in q_char_entropy(spark, d).collect()
    }
    assert rows["uniform8"]["avg_entropy"] == 3.0
    assert rows["const"]["avg_entropy"] == 0.0
    assert rows["uniform2"]["avg_entropy"] == 1.0
    assert rows["const"]["n_low_entropy"] == 1


def test_survival_km_is_monotone_and_complete(spark, sf_dir):
    """S(t) is non-increasing from <=1; the at-risk counts decrease;
    total events across days equals the observed-user count."""
    from cpx_etl_spark.sources import load_table

    rows = QUERIES["q_survival_km"](spark, sf_dir).collect()
    assert rows, "no event days"
    prev_s, prev_n = 1.0 + 1e-9, None
    total_events = 0
    for r in rows:
        assert r["survival"] <= prev_s + 1e-9
        if prev_n is not None:
            assert r["n_risk"] <= prev_n
        prev_s, prev_n = r["survival"], r["n_risk"]
        total_events += r["d_events"]
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as _F

    n_obs = (
        ev.filter(_F.col("event_type") == "purchase")
        .select("user_id").distinct().count()
    )
    assert total_events == n_obs


def test_acf_lag0_normalization(spark, sf_dir):
    """All |r_k| <= 1 (Cauchy-Schwarz on the biased estimator)."""
    rows = QUERIES["q_acf_daily"](spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    assert all(abs(r["acf"]) <= 1.0 + 1e-9 for r in rows)


def test_permutation_test_bounds(spark, sf_dir):
    """p-value in (0, 1], n_ge within [0, 64], and the add-one
    identity p = (1 + n_ge) / 65 holds exactly."""
    r = QUERIES["q_permutation_test"](spark, sf_dir).collect()[0]
    assert 0 <= r["n_ge"] <= 64
    assert 0 < r["p_value"] <= 1
    assert abs(r["p_value"] - round((1 + r["n_ge"]) / 65.0 - 1e-9, 6)) < 1e-9


def test_coverage_curve_is_monotone(spark, sf_dir):
    """Coverage is non-decreasing in k and bounded by 1; covered
    tokens never exceed the corpus total."""
    rows = QUERIES["q_coverage_curve"](spark, sf_dir).collect()
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    prev = -1.0
    for r in rows:
        assert prev <= r["coverage"] <= 1.0
        assert r["covered_tokens"] <= r["n_tokens"]
        prev = r["coverage"]


def test_holt_winters_warmup_and_start(spark, sf_dir, tmp_path):
    """Output days start at 7 (post-warmup); a sub-warmup series
    yields an empty frame instead of crashing inside the grouped map
    (the oracle's recursion guard does the same)."""
    import os

    from cpx_etl_spark.queries.relational import q_holt_winters

    rows = QUERIES["q_holt_winters"](spark, sf_dir).collect()
    assert rows and min(r["day_idx"] for r in rows) == 7
    d = str(tmp_path)
    short = spark.createDataFrame(
        [(i, f"2024-01-0{i+1} 00:00:00", i, "click", 1.0, "{}")
         for i in range(3)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                 "event_type", "value", "props")
    short.write.parquet(os.path.join(d, "events.parquet"))
    assert q_holt_winters(spark, d).count() == 0


def test_skew_kurtosis_degenerate_group_is_null(spark, tmp_path):
    """An all-equal group emits NULL shape stats and zero stddev
    instead of an ANSI divide-by-zero / sqrt(negative) crash."""
    import os

    from cpx_etl_spark.queries.relational import q_skew_kurtosis

    d = str(tmp_path)
    orders = spark.createDataFrame(
        [(1, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
         (2, 2, "O", 100.0, "1995-01-02", "1-URGENT"),
         (3, 3, "O", 100.0, "1995-01-03", "1-URGENT"),
         (4, 4, "O", 50.0, "1995-01-04", "2-HIGH"),
         (5, 5, "O", 150.0, "1995-01-05", "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS DATE) AS o_orderdate",
                 "o_orderpriority")
    orders.write.parquet(os.path.join(d, "orders.parquet"))
    rows = {r["pri"]: r for r in q_skew_kurtosis(spark, d).collect()}
    assert rows["1-URGENT"]["skewness"] is None
    assert rows["1-URGENT"]["excess_kurtosis"] is None
    assert rows["1-URGENT"]["stddev_pop"] == 0.0
    assert rows["2-HIGH"]["skewness"] is not None


def test_seasonal_naive_backtest_degenerate_days_null(spark, tmp_path):
    """ADVICE r14 (low): a single-day corpus (n1=0, n7=0) and a
    <=7-day corpus (n7=0) emit NULL metrics like the DuckDB oracle,
    not an ANSI divide-by-zero."""
    import os

    from cpx_etl_spark.queries.relational import q_seasonal_naive_backtest

    def events(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                     "event_type", "value", "props")

    # single day: n1 = n7 = 0 -> every ratio NULL
    d1 = str(tmp_path / "oneday")
    os.makedirs(d1)
    events([(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 12:00:00", 2, "click", 1.0, "{}")]).write.parquet(
        os.path.join(d1, "events.parquet"))
    rows = q_seasonal_naive_backtest(spark, d1).collect()
    assert rows and all(
        r["mae_snaive"] is None and r["mae_naive1"] is None
        and r["mase"] is None for r in rows
    )

    # 3-day span: n1 > 0 (naive-1 defined) but n7 = 0 -> snaive/mase NULL
    d2 = str(tmp_path / "threedays")
    os.makedirs(d2)
    events([(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-02 00:00:00", 2, "click", 1.0, "{}"),
            (3, "2024-01-03 00:00:00", 3, "click", 1.0, "{}")]).write.parquet(
        os.path.join(d2, "events.parquet"))
    rows = q_seasonal_naive_backtest(spark, d2).collect()
    assert rows and all(
        r["mae_snaive"] is None and r["mase"] is None
        and r["mae_naive1"] is not None for r in rows
    )
