"""Small reference-parity utilities.

- flatten_leaf_values: the reference's ``cpx.values`` walks an entity
  and collects every scalar leaf, skipping '_' meta keys (reference:
  src/main/index.js:178-195). Columnar form: one array<string> column
  of all scalar leaves per row, recursing through structs and arrays.
- detect_message_type: reference stub returns 'JSON' (etl.js:534).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def _leaf_arrays(col: Column, dtype, skip_meta: bool) -> list[Column]:
    """Return array<string> chunks for every leaf under `col`."""
    if isinstance(dtype, StructType):
        out: list[Column] = []
        for f in dtype.fields:
            if skip_meta and f.name == "_":
                continue
            out.extend(_leaf_arrays(col.getField(f.name), f.dataType, skip_meta))
        return out
    if isinstance(dtype, ArrayType):
        elem = dtype.elementType
        if isinstance(elem, StructType):
            # array<struct>: per element, concat its leaf chunks, then flatten
            def leaves_of(x):
                chunks = _leaf_arrays(x, elem, skip_meta)
                return F.concat(*chunks) if len(chunks) > 1 else chunks[0]

            return [F.flatten(F.transform(col, leaves_of))]
        return [F.transform(col, lambda x: x.cast("string"))]
    return [F.array(col.cast("string"))]


def flatten_leaf_values(
    df: DataFrame, out_col: str = "_values", skip_meta: bool = True
) -> DataFrame:
    """Append an array<string> of every scalar leaf value in the row."""
    chunks: list[Column] = []
    for f in df.schema.fields:
        if skip_meta and f.name == "_":
            continue
        chunks.extend(_leaf_arrays(F.col(f.name), f.dataType, skip_meta))
    arr = F.concat(*chunks) if len(chunks) > 1 else chunks[0]
    return df.withColumn(out_col, arr)


def detect_message_type(_df: DataFrame) -> str:
    return "JSON"
