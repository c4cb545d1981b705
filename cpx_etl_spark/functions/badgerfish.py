"""JSON ↔ badgerfish attribute-notation conversion.

Parity: the reference's ``convertJSONtoJSON``/``toBadgerfish``
(reference: src/main/etl.js:503-532) prefixes scalar keys with '@'
(toBfish) or strips the prefix. Columnar re-expression: scalar
top-level columns are renamed; struct columns are rebuilt recursively
(scalar struct fields get the prefix, nested structs/arrays recurse) —
all in one projection, metadata-only for the top level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def _convert_name(name: str, to_bfish: bool) -> str:
    if to_bfish:
        return name if name.startswith("@") else "@" + name
    return name[1:] if name.startswith("@") else name


def _convert_value(col: Column, dtype, to_bfish: bool) -> Column:
    if isinstance(dtype, StructType):
        rebuilt = F.struct(
            *[
                _convert_value(col.getField(f.name), f.dataType, to_bfish).alias(
                    f.name if isinstance(f.dataType, (StructType, ArrayType)) else _convert_name(f.name, to_bfish)
                )
                for f in dtype.fields
            ]
        )
        # struct() of a null struct's fields is a struct of nulls — a
        # missing object must stay missing (the reference walks JSON,
        # where an absent object is never materialized)
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StructType):
        inner = dtype.elementType
        return F.transform(col, lambda x: _convert_value(x, inner, to_bfish))
    return col


def convert(df: DataFrame, to_bfish: bool = True) -> DataFrame:
    """Rename scalar leaves to/from '@' badgerfish attribute keys.

    Mirrors the reference exactly: only non-object values get the
    prefix; container keys keep their names (etl.js:510-524).
    """
    cols = []
    for f in df.schema.fields:
        converted = _convert_value(F.col(f.name), f.dataType, to_bfish)
        if isinstance(f.dataType, (StructType, ArrayType)):
            cols.append(converted.alias(f.name))
        else:
            cols.append(converted.alias(_convert_name(f.name, to_bfish)))
    return df.select(*cols)


def attributes(df: DataFrame) -> DataFrame:
    """Reference ``attributes`` (etl.js:493-501): keep only '@' keys,
    stripped of the prefix."""
    return df.select(
        *[F.col(f"`{c}`").alias(c[1:]) for c in df.columns if c.startswith("@")]
    )
