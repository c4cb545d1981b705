"""Unit tests for the applyView query-tree compiler."""

from __future__ import annotations

import pytest

from cpx_etl_spark.plans.views import ViewCatalog


@pytest.fixture()
def catalog(spark):
    people = spark.createDataFrame(
        [(1, "Ada"), (2, "Bob")], "pid int, name string"
    )
    pets = spark.createDataFrame(
        [(1, "cat", 3), (1, "dog", 1), (2, "fish", 2)],
        "owner int, kind string, age int",
    )
    visits = spark.createDataFrame(
        [("cat", 1, "v1"), ("cat", 2, "v2")], "kind string, seq int, note string"
    )
    return ViewCatalog({"people": people, "pets": pets, "visits": visits})


def test_nested_find_all(catalog):
    out = catalog.apply_view(
        {
            "people": {
                "pets": {"_": {"on": {"owner": "pid"}, "order_by": ["kind"]}},
            }
        }
    )
    rows = {r["pid"]: r["pets"] for r in out.collect()}
    assert [p["kind"] for p in rows[1]] == ["cat", "dog"]
    assert [p["kind"] for p in rows[2]] == ["fish"]


def test_find_one_unique_node(catalog):
    out = catalog.apply_view(
        {
            "people": {
                "oldest": {
                    "_": {"table": "pets", "on": {"owner": "pid"},
                          "unique": True, "order_by": ["age"], "as": "first_pet"},
                }
            }
        }
    )
    rows = {r["pid"]: r["first_pet"] for r in out.collect()}
    assert rows[1]["kind"] == "dog"  # age 1 sorts first
    assert rows[2]["kind"] == "fish"


def test_three_levels_and_where(catalog):
    out = catalog.apply_view(
        {
            "people": {
                "_": {"where": {"name": "Ada"}},
                "pets": {
                    "_": {"on": {"owner": "pid"}, "order_by": ["kind"]},
                    "visits": {"_": {"on": {"kind": "kind"}, "order_by": ["seq"]}},
                },
            }
        }
    )
    rows = out.collect()
    assert len(rows) == 1
    pets = {p["kind"]: p for p in rows[0]["pets"]}
    assert [v["note"] for v in pets["cat"]["visits"]] == ["v1", "v2"]
    assert pets["dog"]["visits"] == []


def test_errors(catalog):
    with pytest.raises(KeyError, match="unknown table"):
        catalog.apply_view({"nope": {}})
    with pytest.raises(ValueError, match="needs '_.on'"):
        catalog.apply_view({"people": {"pets": {"_": {}}}})
    with pytest.raises(ValueError, match="exactly one root"):
        catalog.apply_view({"people": {}, "pets": {}})
