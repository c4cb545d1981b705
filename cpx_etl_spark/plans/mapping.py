"""Declarative transform-mapping compiler.

Parity: the reference's ``applyTransform`` walks a mapping spec where
each target key maps to a path reference (array whose head is a path),
a nested object (built recursively), or a constant (reference:
src/main/etl.js:324-405). Here the same spec shape compiles to ONE
Spark projection:

    {
      "id":        ["doc_id"],          # path ref (list head = path)
      "language":  ["meta.lang"],       # nested struct access
      "n_tokens":  ["#tokens"],         # array length
      "profile":   {"src": ["meta.source"]},   # nested object -> struct
      "items":     ["rows", {"v": ["x"]}],     # array mapping (per element)
      "version":   3,                   # constant
    }

The reference applies this per record in JS; compiled to Columns it is
whole-stage-codegen'd and never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cpx_etl_spark.functions.paths import path_col, path_lineage


def _compile_value(spec, root: Column | None) -> Column:
    if isinstance(spec, list):
        if not spec or not isinstance(spec[0], str):
            raise ValueError(f"mapping: syntax error: {spec!r}")
        head, rest = spec[0], spec[1:]
        base = path_col(head, root)
        if not rest:
            return base
        if len(rest) == 1 and isinstance(rest[0], dict):
            elem_spec = rest[0]
            return F.transform(base, lambda x: _compile_struct(elem_spec, x))
        raise ValueError(f"mapping: syntax error after path {head!r}")
    if isinstance(spec, dict):
        return _compile_struct(spec, root)
    return F.lit(spec)


def _compile_struct(spec: dict, root: Column | None) -> Column:
    return F.struct(*[_compile_value(v, root).alias(k) for k, v in spec.items()])


def compile_mapping(spec: dict) -> list[Column]:
    """Compile a mapping spec to aliased top-level Columns."""
    return [_compile_value(v, None).alias(k) for k, v in spec.items()]


def apply_mapping(df: DataFrame, spec: dict) -> DataFrame:
    return df.select(*compile_mapping(spec))


def mapping_lineage(spec: dict) -> list[tuple[str, str, str]]:
    """Column-level lineage of a mapping spec WITHOUT executing it:
    (output_path, kind, source) rows where kind is 'path' (reads an
    input path), 'length' (reads an array's size), or 'constant'.
    The walk mirrors _compile_value exactly, so anything the compiler
    would accept is covered and anything it would reject raises the
    same ValueError — the impact-analysis / audit view a declarative
    mapping engine owes its operators (which inputs feed this output?
    which outputs break if an input column is dropped?)."""

    rows: list[tuple[str, str, str]] = []

    def walk(out: str, v, prefix: str) -> None:
        if isinstance(v, list):
            if not v or not isinstance(v[0], str):
                raise ValueError(f"mapping: syntax error: {v!r}")
            head, rest = v[0], v[1:]
            # per-segment normalization mirrors path_col (ADVICE r6):
            # '$' resets to the row root (dropping the array-scope
            # prefix) and '#field' may appear mid-path-last, e.g.
            # 'meta.#tokens' -> ('length', 'meta.tokens')
            kind, norm, scoped = path_lineage(head)
            src = f"{prefix}{norm}" if scoped else norm
            rows.append((out, kind, src))
            if rest:
                if len(rest) == 1 and isinstance(rest[0], dict):
                    for k2, v2 in rest[0].items():
                        walk(f"{out}[].{k2}", v2, f"{src}[].")
                else:
                    raise ValueError(f"mapping: syntax error after path {head!r}")
        elif isinstance(v, dict):
            for k2, v2 in v.items():
                walk(f"{out}.{k2}", v2, prefix)
        else:
            rows.append((out, "constant", repr(v)))

    for k, v in spec.items():
        walk(k, v, "")
    return rows
