"""Fixed-width record encode/decode.

Parity: the reference's ``applySchema`` with force='TRUE' renders each
typed value into a sized text cell — zero-padded numbers, space-padded
strings, YYYYMMDD dates, '0…01'/'0…0' booleans, all-blank for null
(reference: src/main/etl.js:212-295). Encode/decode are pure column
expressions (concat/lpad/rpad/substring), so a 100 TB fixed-width
export or ingest is one codegen'd projection with no Python in the loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Field:
    name: str
    width: int
    type: str  # number | string | date | boolean


def encode_field(col: Column, f: Field) -> Column:
    blank = F.lit(" " * f.width)
    if f.type == "number":
        # parseInt semantics: truncate toward zero (double->long cast),
        # then left-pad zeros, clip to width
        digits = F.substring(col.cast("long").cast("string"), 1, f.width)
        cell = F.lpad(digits, f.width, "0")
    elif f.type == "string":
        cell = F.rpad(F.substring(col.cast("string"), 1, f.width), f.width, " ")
    elif f.type == "date":
        cell = F.date_format(col, "yyyyMMdd")
        blank = F.lit("0" * f.width)
    elif f.type == "boolean":
        # explicit null branch: when(col) would route null to otherwise()
        cell = (
            F.when(col.isNull(), F.lit(None))
            .when(col, F.lit("0" * (f.width - 1) + "1"))
            .otherwise(F.lit("0" * f.width))
        )
    else:
        raise ValueError(f"fixed_width: invalid type {f.type}")
    return F.coalesce(cell, blank)


def encode(df: DataFrame, fields: list[Field], line_col: str = "line") -> DataFrame:
    """Append a fixed-width `line` column rendered from `fields`."""
    return df.withColumn(line_col, F.concat(*[encode_field(F.col(f.name), f) for f in fields]))


def decode(df: DataFrame, fields: list[Field], line_col: str = "line") -> DataFrame:
    """Parse `line_col` back into typed columns (inverse of encode)."""
    out = []
    pos = 1
    for f in fields:
        cell = F.substring(F.col(line_col), pos, f.width)
        pos += f.width
        if f.type == "number":
            col = F.when(F.trim(cell) == "", None).otherwise(F.trim(cell).cast("long"))
        elif f.type == "string":
            col = F.when(F.trim(cell) == "", None).otherwise(F.rtrim(cell))
        elif f.type == "date":
            col = F.when(cell == "0" * f.width, None).otherwise(
                F.to_timestamp(cell, "yyyyMMdd")
            )
        elif f.type == "boolean":
            col = F.when(F.trim(cell) == "", None).otherwise(
                cell.substr(f.width, 1) == "1"
            )
        else:
            raise ValueError(f"fixed_width: invalid type {f.type}")
        out.append(col.alias(f.name))
    return df.select(*df.columns, *out)


def read_fixed_width(spark, path: str, fields: list[Field]) -> DataFrame:
    """Read a fixed-width text file into typed columns (one scan +
    one projection; splittable like any text source)."""
    raw = spark.read.text(path).withColumnRenamed("value", "line")
    return decode(raw, fields).drop("line")


def write_fixed_width(df: DataFrame, fields: list[Field], path: str, mode: str = "overwrite") -> None:
    encode(df, fields).select("line").write.mode(mode).text(path)
