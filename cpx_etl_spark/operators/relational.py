"""Relational view operators.

Capability parity: the reference builds nested query trees that compile
to SQL joins with nested `include` results and findOne/findAll
semantics (reference: src/main/etl.js:28-33 etlToSequelize,
src/main/etl.js:472-491 applyView). Spark-first re-expression:

- ``nest``        join + groupBy/collect_list -> array<struct> column
                  (the nested findAll include)
- ``unique_view`` deterministic first-row-per-key (findOne)
- ``denest``      explode a nested array back to rows
- ``enrich``      ordered left-join lookups (reference extract,
                  src/main/etl.js:729-756)

All are pure DataFrame compositions: Catalyst chooses broadcast vs
shuffle join, pushes filters below the join, and prunes columns into
the parquet scan. Nothing here ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nest(
    parent: DataFrame,
    child: DataFrame,
    on: str | list[str],
    nested_name: str,
    order_by: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """Attach `child` rows to each `parent` row as array<struct>.

    Equivalent of the reference's non-unique include (findAll nested in
    the parent record). The child is pre-aggregated BEFORE the join so
    the join is 1:1 on the key — one shuffle for the groupBy, and the
    join itself can broadcast if the aggregated child is small.

    ``order_by`` makes the array deterministic (array_sort over struct
    fields would reorder fields; instead sort_array on a (key, struct)
    trick is avoided by collecting after a repartition+sortWithinPartitions
    is NOT guaranteed — so we sort explicitly via array_sort on structs
    whose FIRST fields are the order_by columns).
    """
    keys = [on] if isinstance(on, str) else list(on)
    order_cols = list(order_by)
    # Build the struct with order_by columns first => array_sort gives a
    # deterministic lexicographic order without a Python comparator.
    other = [c for c in child.columns if c not in keys and c not in order_cols]
    struct_cols = [F.col(c) for c in order_cols + other]
    agg = (
        child.groupBy(*[F.col(k) for k in keys])
        .agg(F.array_sort(F.collect_list(F.struct(*struct_cols))).alias(nested_name))
    )
    return parent.join(agg, on=keys, how=how).withColumn(
        nested_name, F.coalesce(F.col(nested_name), F.array().cast(agg.schema[nested_name].dataType))
    )


def denest(df: DataFrame, nested_name: str, keep: Sequence[str] | None = None) -> DataFrame:
    """Explode an array<struct> column back to one row per element."""
    keep_cols = list(keep) if keep is not None else [c for c in df.columns if c != nested_name]
    exploded = df.select(*keep_cols, F.explode(nested_name).alias("_elem"))
    elem_fields = exploded.schema["_elem"].dataType.fieldNames()
    return exploded.select(*keep_cols, *[F.col(f"_elem.{f}").alias(f) for f in elem_fields])


def unique_view(
    df: DataFrame,
    keys: str | list[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """findOne parity: deterministic first row per key.

    row_number over (key, order) — a single shuffle on the key; AQE
    splits skewed keys. ``order_by`` must be a total order within key
    for cross-engine determinism.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def enrich(
    df: DataFrame,
    lookups: Sequence[tuple[DataFrame, str | list[str], dict[str, str]]],
) -> DataFrame:
    """Dependency-ordered enrichment joins (reference `extract`).

    Each lookup is (dim_df, join_key(s), {source_col: new_name}).
    Dims are broadcast — the reference did one keyed findOne per row
    per field; here it is a map-side hash join, no per-row round trips.
    """
    out = df
    for dim, on, rename in lookups:
        keys = [on] if isinstance(on, str) else list(on)
        proj = dim.select(*keys, *[F.col(src).alias(dst) for src, dst in rename.items()])
        out = out.join(F.broadcast(proj), on=keys, how="left")
    return out


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: str | list[str]
) -> DataFrame:
    """SCD-1 upsert as a pure DataFrame op (no table format required):
    full-outer join on the keys, update columns win where present,
    unmatched update rows insert. One shuffle; at scale, pre-bucket
    both sides on the keys to make it shuffle-free."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    upd = updates.select(
        *keys, *[F.col(c).alias(f"_u_{c}") for c in updates.columns if c not in keys]
    )
    joined = base.join(upd, on=keys, how="full_outer")
    out_cols = [
        F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
        if f"_u_{c}" in joined.columns
        else F.col(c)
        for c in value_cols
    ]
    return joined.select(*keys, *out_cols)


def scd2_intervals(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD-2 history: each change row is valid from its own timestamp
    until the next change of the same key (null = current). One window
    shuffle on the key."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def semi_join(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    return df.join(other, on=on, how="left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    return df.join(other, on=on, how="left_anti")


def additive_rollup_merge(
    base: DataFrame | None, delta: DataFrame, keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Incremental materialized-rollup maintenance: combine a stored
    rollup with a NEW BATCH's partial aggregate by ADDING the additive
    measures per key (counts, decimal sums) — the refresh touches
    |delta keys| + |stored keys| rows, never the fact history. The
    incremental invariant: refresh(refresh(R, b1), b2) ==
    full_recompute(b1 ∪ b2) holds exactly because the measures are
    associative and the sums accumulate in DECIMAL (order-independent).
    ``base=None`` bootstraps from the first batch."""
    if base is None:
        return delta
    keys = list(keys)
    d = delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in sum_cols]
    )
    joined = base.join(d, on=keys, how="full_outer")
    out = [
        (
            F.coalesce(F.col(c), F.lit(0))
            + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
        ).alias(c)
        for c in sum_cols
    ]
    return joined.select(*keys, *out)


def apply_cdc(
    base: DataFrame, changes: DataFrame, keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change set to a snapshot: ``changes`` carries an
    ``op_col`` of 'U' (upsert: update-or-insert) or 'D' (delete). One
    full-outer join on the keys resolves all three outcomes — matched
    U replaces, matched D drops, unmatched U inserts, unmatched D is a
    no-op — exactly the MERGE WHEN MATCHED / NOT MATCHED ladder,
    expressed as a join so plain parquet (or any format) can run it.
    Later-wins conflict resolution within a batch is the CALLER's job
    (dedupe the change set first); this operator assumes one change
    row per key."""
    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    ch = changes.select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_u_{c}") for c in changes.columns
          if c not in keys and c != op_col],
    )
    joined = base.join(ch, on=keys, how="full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") == "U")
    out_cols = [
        F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
        if f"_u_{c}" in joined.columns
        else F.col(c)
        for c in value_cols
    ]
    return joined.filter(keep).select(*keys, *out_cols)
