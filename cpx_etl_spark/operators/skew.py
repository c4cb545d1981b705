"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting handles sort-merge cases automatically (it
is enabled in session.py); these operators cover the two patterns AQE
cannot: hot-key AGGREGATION fan-in and broadcast-replicated joins
where one side's key histogram is pathological.

- salted_agg: two-phase aggregation — partials over (keys, salt)
  spread a hot key across `salt_buckets` reducers, then a cheap final
  merge over keys. Supported merge-able aggs: sum/count/min/max.
- salted_join: replicate the SMALL side `salt_buckets` times, salt the
  big side's rows uniformly, join on (key, salt). Every salt value of
  a hot key lands on a different reducer.

Salts derive from xxhash64 over a uniform per-row expression —
deterministic plans, uniform spread, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_AGG_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _salt(df: DataFrame, buckets: int) -> Column:
    # hash every column of the row — uniform even when no unique id exists
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {column: 'sum'|'count'|'min'|'max'}; output columns are
    '<fn>_<col>'.
    """
    for fn in aggs.values():
        if fn not in _AGG_PARTIAL:
            raise ValueError(f"salted_agg: unsupported agg {fn!r}")
    salted = df.withColumn("_salt", _salt(df, salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _AGG_PARTIAL[fn](F.col(col)).alias(f"_p_{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _AGG_MERGE[fn](F.col(f"_p_{fn}_{col}")).alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    The small side grows `salt_buckets`x (keep it genuinely small);
    each hot key spreads over `salt_buckets` reducers.

    Only inner/left are supported: under right/full, an unmatched
    replicated small-side row would survive once per salt bucket,
    silently duplicating output.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported (unmatched replicated "
            "small-side rows would duplicate under right/full joins)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn("_salt", _salt(big, salt_buckets))
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_salted.join(small_rep, on=keys + ["_salt"], how=how)
    return out.drop("_salt")
