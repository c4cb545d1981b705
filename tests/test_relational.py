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
