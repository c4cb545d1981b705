"""Declarative typed-schema coercion.

Parity: the reference's ``applySchema`` (reference: src/main/etl.js:191-322)
coerces each field to boolean/number/date/string, where the
capitalized type name means nullable ('' and '0000-00-00' become
null) and lowercase is strict. Its row-at-a-time throw-on-error
becomes, distributed: every coercion is a column expression, and
violations land in an ``_errors`` array column instead of aborting the
job — callers filter or assert. Fixed-width `force` encoding lives in
sources/fixed_width.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_TOKENS = {"", "0000-00-00"}


def coerce_column(col: Column, spec: str, fmt: str = "yyyy-MM-dd") -> Column:
    """Return `col` coerced per the schema type name.

    spec: 'boolean'|'number'|'date'|'string' (strict) or the
    capitalized nullable variant. Strings parse; numbers truncate like
    the reference's parseInt; dates parse with `fmt`.
    """
    base = spec.lower()
    nullable = spec[0].isupper()
    c = col.cast("string")
    if nullable:
        c = F.when(c.isin(*_NULL_TOKENS), F.lit(None)).otherwise(c)
    if base == "boolean":
        out = F.when(c == "false", F.lit(False)).otherwise(
            F.when(c.isNotNull(), F.lit(True))
        )
    elif base == "number":
        # reference uses parseInt => truncate toward zero (etl.js:251);
        # double->long cast truncates toward zero, unlike floor. try_cast
        # keeps ANSI mode from aborting the job — bad cells become _errors
        out = c.try_cast("double").try_cast("long")
    elif base == "date":
        out = F.try_to_timestamp(c, F.lit(fmt))
    elif base == "string":
        out = c
    else:
        raise ValueError(f"applySchema: invalid type: {spec}")
    return out


def violation(col: Column, coerced: Column, spec: str) -> Column:
    """True when a non-null input failed coercion (strict error in the
    reference; here it feeds the _errors column)."""
    nullable = spec[0].isupper()
    s = col.cast("string")
    if nullable:
        # null tokens legitimately become null for the nullable variants
        s = F.when(s.isin(*_NULL_TOKENS), F.lit(None)).otherwise(s)
        bad_null = F.lit(False)
    else:
        bad_null = s.isNull()
    return bad_null | (s.isNotNull() & coerced.isNull())


def schema_apply(
    df: DataFrame,
    schema: dict[str, str | tuple[str, str]],
    errors_col: str = "_errors",
) -> DataFrame:
    """Coerce every column named in `schema`; collect violation names.

    schema value: type name, or (type, date_format). One projection —
    no shuffle, stays in whole-stage codegen.
    """
    out_cols: list[Column] = []
    err_flags: list[Column] = []
    specs = {
        name: (v if isinstance(v, tuple) else (v, "yyyy-MM-dd"))
        for name, v in schema.items()
    }
    for name in df.columns:
        if name in specs:
            spec, fmt = specs[name]
            coerced = coerce_column(F.col(name), spec, fmt)
            out_cols.append(coerced.alias(name))
            err_flags.append(
                F.when(violation(F.col(name), coerced, spec), F.lit(name))
            )
        else:
            out_cols.append(F.col(name))
    errs = F.array_compact(F.array(*err_flags)) if err_flags else F.array()
    return df.select(*out_cols, errs.alias(errors_col))


def assert_valid(df: DataFrame, errors_col: str = "_errors") -> DataFrame:
    """Strict mode: raise if any row has coercion errors (runs a job)."""
    bad = df.filter(F.size(errors_col) > 0)
    sample = bad.limit(1).collect()
    if sample:
        raise ValueError(f"applySchema: coercion errors, e.g. {sample[0].asDict()}")
    return df.drop(errors_col)
