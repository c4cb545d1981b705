"""Declarative end-to-end pipeline compiler.

Parity: the reference wires match → defaults → schema → transform →
validate → load as imperative phases over each message (reference:
src/main/etl.js: match 544, defaults 608, applySchema 191,
applyTransform 324, applyValidation 407, load 792). Here the same
stages are a spec that compiles to ONE DataFrame plan — Catalyst sees
all of it and can push filters below everything:

    spec = {
        "source":   "events",
        "derive":   {"k": ("json", "props", "$.k")},     # pre-extractions
        "schema":   {"k": "Number"},                      # schema_apply
        "defaults": {"k": 0},                             # apply_defaults
        "transform": {...mapping spec...},                # apply_mapping
        "validate": {...rules...},                        # validate
        "route":    [("name", predicate_spec), ...],      # route
    }

Stages are optional; order is fixed (the reference's phase order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpx_etl_spark.functions.schema_apply import schema_apply
from cpx_etl_spark.operators.patch import apply_defaults
from cpx_etl_spark.operators.routing import route
from cpx_etl_spark.operators.validation import validate
from cpx_etl_spark.plans.mapping import apply_mapping
from cpx_etl_spark.sources import load_table


def _derive_col(spec):
    kind, *args = spec
    if kind == "json":
        src, path = args[:2]
        return F.get_json_object(F.col(src), path)
    if kind == "expr":
        return F.expr(args[0])
    raise ValueError(f"pipeline derive: unknown kind {kind!r}")


def _derive_order(derive: dict) -> list[str]:
    """Dependency-ordered derive names (reference `extract` declares
    `deps` per field, etl.js:729-756 resolves them promise-by-promise;
    here a topological sort orders the withColumn chain). A derive spec
    may carry an optional trailing deps list: ("expr", "a * 2", ["a"])."""
    deps = {
        name: [d for d in (spec[-1] if isinstance(spec[-1], list) else []) if d in derive]
        for name, spec in derive.items()
    }
    order: list[str] = []
    seen: set[str] = set()

    def visit(name: str, stack: tuple = ()):
        if name in seen:
            return
        if name in stack:
            raise ValueError(f"pipeline derive: circular deps at {name!r}")
        for d in deps[name]:
            visit(d, stack + (name,))
        seen.add(name)
        order.append(name)

    for name in derive:
        visit(name)
    return order


def compile_pipeline(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    df = load_table(spark, sf_dir, spec["source"])
    derive = spec.get("derive", {})
    for name in _derive_order(derive):
        df = df.withColumn(name, _derive_col(derive[name]))
    if "schema" in spec:
        df = schema_apply(df, spec["schema"])
    if "defaults" in spec:
        df = apply_defaults(df, spec["defaults"])
    if "transform" in spec:
        df = apply_mapping(df, spec["transform"])
    if "validate" in spec:
        df = validate(df, spec["validate"])
    if "route" in spec:
        df = route(df, spec["route"])
    return df


def load_related_split(
    df: DataFrame, entities: dict[str, tuple[list[str], dict[str, str]]]
) -> dict[str, DataFrame]:
    """Reference `load`/`insertRelated` parity (etl.js:770-829): split a
    denormalized frame into normalized per-entity insert sets.

    entities: name -> (pk_cols, {source_col: target_col}). Each entity
    frame is deduped on its PK — the distributed version of "insert the
    header once, then its related rows".
    """
    out = {}
    for name, (pk, cols) in entities.items():
        proj = df.select(*pk, *[F.col(s).alias(t) for s, t in cols.items()])
        out[name] = proj.dropDuplicates(pk)
    return out
