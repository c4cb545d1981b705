"""Defaults patching.

Parity: the reference's ``defaults``/``applyPatch``/``apply`` set a
value at a (possibly nested) path only when it is currently undefined
(reference: src/main/etl.js:596-624, 683-697). Columnar form:
coalesce for top-level columns, withField for struct paths, and new
columns are created when the path does not exist — one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def apply_defaults(df: DataFrame, patch: dict[str, object]) -> DataFrame:
    """Fill each dotted path with its default where null/missing."""
    out = df
    for path, value in patch.items():
        parts = path.split(".")
        top = parts[0]
        if len(parts) == 1:
            if top in out.columns:
                out = out.withColumn(top, F.coalesce(F.col(top), F.lit(value)))
            else:
                out = out.withColumn(top, F.lit(value))
            continue
        if top not in out.columns or not isinstance(out.schema[top].dataType, StructType):
            raise ValueError(f"apply_defaults: {path}: {top} is not a struct column")
        field_path = ".".join(parts[1:])
        out = out.withColumn(
            top,
            F.col(top).withField(
                field_path, F.coalesce(F.col(path), F.lit(value))
            ),
        )
    return out
