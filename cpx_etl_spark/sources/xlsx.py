"""XLSX workbook source.

Parity: the reference converts an XLSX buffer to
{sheetName: row-object[]} (reference: src/main/index.js:143-159).
Spark-first shape: each sheet becomes a DataFrame. The xlsx parser
library is not available in this container, so the real reader is
import-gated; a deterministic in-code workbook backs the tests and the
driver query. At scale, XLSX is a driver-side (or mapInPandas-per-file)
parse feeding parquet — spreadsheets are small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The deterministic fake workbook (stands in for an .xlsx fixture).
FAKE_WORKBOOK: dict[str, tuple[str, list[tuple]]] = {
    "people": (
        "name string, age long, city string",
        [("Alice", 34, "Amsterdam"), ("Bob", 28, "Berlin"), ("Carol", 41, "Cadiz")],
    ),
    "scores": (
        "name string, score double",
        [("Alice", 91.5), ("Bob", 78.0)],
    ),
}


def read_xlsx(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read every non-empty sheet of an XLSX file into DataFrames."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - container lacks the lib
        raise NotImplementedError(
            "xlsx parsing requires openpyxl, which is not installed in this "
            "environment; use fake_workbook() for deterministic testing"
        ) from e
    wb = openpyxl.load_workbook(path, read_only=True)
    out: dict[str, DataFrame] = {}
    for ws in wb.worksheets:
        rows = list(ws.iter_rows(values_only=True))
        if len(rows) < 2:
            continue
        header = [str(h) for h in rows[0]]
        out[ws.title] = spark.createDataFrame(rows[1:], header)
    return out


def fake_workbook(spark: SparkSession) -> dict[str, DataFrame]:
    """Deterministic stand-in workbook (same shape as read_xlsx output)."""
    return {
        sheet: spark.createDataFrame(rows, schema)
        for sheet, (schema, rows) in FAKE_WORKBOOK.items()
    }
