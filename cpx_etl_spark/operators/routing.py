"""Message matching / routing.

Parity: the reference matches an incoming message against registered
mappings by meta fields and picks the FIRST match, erroring when none
match (reference: src/main/etl.js:544-563, getMapping 675-681).
Distributed form: the registered routes compile to one CASE chain —
every row is tagged with its first-matching route in a single
projection, and non-matching rows get the reject tag instead of a
thrown error (they stay addressable downstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cpx_etl_spark.operators.validation import field_valid

REJECTED = "__rejected__"


def _route_pred(spec) -> Column:
    """A route predicate: a Column, or {field: rule-list} all-of dict."""
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, dict):
        pred = F.lit(True)
        for field, rules in spec.items():
            rules = rules if isinstance(rules, list) else [rules]
            pred = pred & field_valid(F.col(field), rules)
        return pred
    raise ValueError(f"routing: bad predicate spec {spec!r}")


def route(
    df: DataFrame,
    routes: Sequence[tuple[str, object]],
    route_col: str = "_route",
) -> DataFrame:
    """Tag each row with the name of its first matching route."""
    expr: Column = F.lit(REJECTED)
    for name, spec in reversed(list(routes)):
        expr = F.when(_route_pred(spec), F.lit(name)).otherwise(expr)
    return df.withColumn(route_col, expr)


def split(
    df: DataFrame,
    routes: Sequence[tuple[str, object]],
    include_rejected: bool = True,
) -> dict[str, DataFrame]:
    """Materialize one filtered frame per route (shares the tagged plan)."""
    tagged = route(df, routes)
    names = [name for name, _ in routes] + ([REJECTED] if include_rejected else [])
    return {n: tagged.filter(F.col("_route") == n).drop("_route") for n in names}
