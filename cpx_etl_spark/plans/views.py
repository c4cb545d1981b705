"""applyView query-tree compiler.

Parity: the reference registers relational models with associations
and compiles a nested query tree into joins whose results nest child
records inside parents, with findOne (unique) vs findAll semantics per
node (reference: src/main/etl.js:28-33 etlToSequelize, 143-167
registerModel, 472-491 applyView; example tree:
src/test/examples/views/person.js).

Spark-first re-expression: a ViewCatalog holds named frames; a view
spec is the same recursive dict shape —

    {
      "Customer": {
        "_": {"where": {"c_mktsegment": "BUILDING"}},     # node options
        "Orders": {
            "_": {"on": {"o_custkey": "c_custkey"},        # join keys
                  "unique": False,                         # findAll -> array
                  "order_by": ["o_orderkey"]},
            "Lineitem": {
                "_": {"on": {"l_orderkey": "o_orderkey"},
                      "unique": False, "order_by": ["l_linenumber"]},
            },
        },
      },
    }

— compiled bottom-up into ONE DataFrame: child nodes become
array<struct> columns (findAll) or struct columns (findOne, first row
by order_by) on the parent. Every nesting is a groupBy+join pair that
Catalyst plans as ordinary shuffles/broadcasts; nothing is fetched
row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpx_etl_spark.operators.relational import nest, unique_view


class ViewCatalog:
    """Named tables + view compilation (the reference's model registry)."""

    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = dict(tables)

    @classmethod
    def from_sf_dir(cls, spark: SparkSession, sf_dir: str) -> "ViewCatalog":
        from cpx_etl_spark.sources import TABLES, load_table

        return cls({t: load_table(spark, sf_dir, t) for t in TABLES})

    def register(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df

    def _apply_where(self, df: DataFrame, where: dict | None) -> DataFrame:
        for col, val in (where or {}).items():
            df = df.filter(F.col(col) == F.lit(val))
        return df

    def _compile_node(self, name: str, spec: dict) -> DataFrame:
        """Compile one node: resolve children first, attach them as
        nested columns, return the enriched frame."""
        if name not in self.tables:
            raise KeyError(f"view: unknown table {name!r}")
        opts = spec.get("_", {})
        df = self._apply_where(self.tables[name], opts.get("where"))
        for child_name, child_spec in spec.items():
            if child_name == "_":
                continue
            child_opts = child_spec.get("_", {})
            on = child_opts.get("on")
            if not on:
                raise ValueError(f"view: child {child_name!r} needs '_.on' join keys")
            # '_.table' lets two children target the same table under
            # different field names (e.g. all orders + first order)
            child_df = self._compile_node(child_opts.get("table", child_name), child_spec)
            # rename child join keys to parent names so nest() joins 1:1
            for child_key, parent_key in on.items():
                if child_key != parent_key:
                    child_df = child_df.withColumnRenamed(child_key, parent_key)
            keys = list(on.values())
            order_by = child_opts.get("order_by", [])
            field = child_opts.get("as", child_name.lower())
            if child_opts.get("unique", False):
                # findOne: deterministic first row -> one struct column
                first = unique_view(child_df, keys, [F.col(c) for c in order_by] or keys)
                payload = [c for c in first.columns if c not in keys]
                first = first.select(*keys, F.struct(*payload).alias(field))
                df = df.join(first, on=keys, how="left")
            else:
                # findAll: sorted array<struct> column
                df = nest(df, child_df, on=keys, nested_name=field, order_by=order_by)
        return df

    def apply_view(self, spec: dict) -> DataFrame:
        """Compile a single-root view tree to a DataFrame."""
        if len(spec) != 1:
            raise ValueError("view spec must have exactly one root")
        ((name, node),) = spec.items()
        return self._compile_node(name, node)
