"""Unit tests for operators/relational.py on tiny literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpx_etl_spark.operators.relational import denest, enrich, nest, unique_view


def test_nest_groups_children_sorted(spark):
    parent = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, name string")
    child = spark.createDataFrame(
        [(1, 20, "x"), (1, 10, "y"), (2, 30, "z")], "id int, seq int, val string"
    )
    out = nest(parent, child, on="id", nested_name="kids", order_by=("seq",))
    rows = {r["id"]: r["kids"] for r in out.collect()}
    assert [k["seq"] for k in rows[1]] == [10, 20]
    assert [k["val"] for k in rows[1]] == ["y", "x"]
    assert rows[3] == []  # parent with no children keeps an empty array


def test_denest_roundtrip(spark):
    parent = spark.createDataFrame([(1,), (2,)], "id int")
    child = spark.createDataFrame([(1, 10), (1, 11), (2, 12)], "id int, v int")
    nested = nest(parent, child, on="id", nested_name="c", order_by=("v",))
    flat = denest(nested, "c", keep=["id"])
    assert sorted((r["id"], r["v"]) for r in flat.collect()) == [(1, 10), (1, 11), (2, 12)]


def test_unique_view_picks_deterministic_first(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-02", 100), (1, "2020-01-01", 200), (2, "2020-01-01", 300)],
        "k int, d string, v int",
    )
    out = unique_view(df, "k", order_by=[F.col("d"), F.col("v")]).collect()
    got = {r["k"]: (r["d"], r["v"]) for r in out}
    assert got == {1: ("2020-01-01", 200), 2: ("2020-01-01", 300)}


def test_enrich_broadcast_lookup(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k int, label string")
    out = enrich(fact, [(dim, "k", {"label": "k_label"})])
    got = {r["k"]: r["k_label"] for r in out.collect()}
    assert got == {1: "one", 2: "two", 3: None}


def test_asof_join_semantics(spark):
    from cpx_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 12:00:00", "b"),
         (2, "2024-01-01 10:00:00", "c")],
        "k int, ts string, tag string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 10.0), (1, "2024-01-01 11:00:00", 20.0),
         (1, "2024-01-01 12:00:00", 30.0)],
        "k int, ts string, rate double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "rate")

    out = {(r["k"], r["tag"]): r["asof_rate"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()}
    assert out[(1, "a")] == 10.0          # latest at-or-before 10:00
    assert out[(1, "b")] == 30.0          # equal timestamps match (<=)
    assert out[(2, "c")] is None          # no right rows for key 2

    tol = {(r["k"], r["tag"]): r["asof_rate"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     tolerance_us=10 * 60 * 1_000_000).collect()}
    assert tol[(1, "a")] is None          # 09:30 is older than 10min tolerance
    assert tol[(1, "b")] == 30.0
