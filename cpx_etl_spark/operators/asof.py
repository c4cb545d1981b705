"""As-of (point-in-time) join.

For each left row, attach the latest right row whose timestamp is <=
the left timestamp, per key. Spark has no native ASOF JOIN; the
scalable formulation is the union-and-carry pattern:

    union(left tagged L, right tagged R)
      -> window per key ordered by (ts, tag, seq)
      -> last_value(right payload, ignoreNulls) carried forward
      -> keep L rows

ONE shuffle on the key (the same cost as a plain equi-join), no range
cross product, no per-row lookups — this is how you as-of join two
100 TB event streams. The right side must be unique per (key, ts)
for deterministic results; dedupe first (unique_view) if it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right values at or before each left row.

    tolerance_us: optionally null out matches older than this many
    microseconds before the left timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    lpart = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[c for c in left.columns if c not in keys]).alias("_lpayload"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("_rpayload"),
        F.lit(None).cast("long").alias("_rts"),
    )
    rpart = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[c for c in left.columns if c not in keys]).alias("s")
            ).schema["s"].dataType
        ).alias("_lpayload"),
        F.struct(*value_cols).alias("_rpayload"),
        F.unix_micros(F.col(right_ts)).alias("_rts"),
    )
    # right rows sort BEFORE left rows at equal ts (_is_left 0 < 1) so a
    # right row at exactly left.ts matches (<= semantics, like ASOF JOIN)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_micros("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lpart.unionByName(rpart)
        .withColumn("_r", F.last("_rpayload", ignorenulls=True).over(w))
        .withColumn("_r_ts", F.last("_rts", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_us is not None:
        in_tol = (F.unix_micros("_ts") - F.col("_r_ts")) <= tolerance_us
        carried = carried.withColumn(
            "_r", F.when(F.col("_r_ts").isNotNull() & in_tol, F.col("_r"))
        )
    left_fields = [c for c in left.columns if c not in keys]
    return carried.select(
        *keys,
        *[F.col("_lpayload").getField(c).alias(c) for c in left_fields],
        *[F.col("_r").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
