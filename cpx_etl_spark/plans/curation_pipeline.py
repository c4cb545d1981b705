"""Declarative curation-pipeline compiler — the reference's spec-driven
pipeline pattern (plans/pipeline.py, etl.js:544-756: match → defaults →
schema → transform → validate in ONE fused plan) applied to the
LLM-corpus curation family: a dict spec chains quality filtering, exact
dedup, deterministic sampling, and token tagging into a single
DataFrame plan Catalyst can optimize end-to-end (filters push through
every step; nothing materializes between steps).

The SAME spec also compiles to a DuckDB oracle (sql_curation_pipeline):
one CTE per step, each derived from the step's parameters — so the
correctness gate verifies the COMPILER, not one hand-paired query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpx_etl_spark.functions.text import (
    PUNCT_PATTERN,
    STOPWORDS,
    punct_count,
    quality_score,
    stopword_count,
    sum_token_lengths,
    token_count,
    tokens,
)
from cpx_etl_spark.sources import load_table

_TOKENS_SQL = "string_split(text, ' ')"


def _quality_expr():
    t = tokens(F.col("text"))
    n_tok = token_count(F.col("text"))
    mean_len = sum_token_lengths(t) / n_tok
    stop_ratio = stopword_count(t, STOPWORDS["en"]) / n_tok
    punct_ratio = punct_count(F.col("text")) / F.length("text")
    return quality_score(mean_len, stop_ratio, punct_ratio)


_SQL_QUALITY = f"""ROUND(GREATEST(0.0, LEAST(1.0,
    0.12 * (list_sum(list_transform({_TOKENS_SQL}, s -> length(s))) * 1.0
            / len({_TOKENS_SQL}))
    + 0.5 * (len(list_filter({_TOKENS_SQL},
             s -> s IN ({", ".join(repr(w) for w in STOPWORDS["en"])}))) * 1.0
             / len({_TOKENS_SQL}))
    - 2.0 * (len(regexp_extract_all(text, '{PUNCT_PATTERN}')) * 1.0
             / length(text)))) - 1e-9, 4) + 0"""


def _apply_step(df: DataFrame, step: dict) -> DataFrame:
    op = step["op"]
    if op == "quality_filter":
        return df.filter(_quality_expr() >= step["min_quality"])
    if op == "exact_dedup":
        keep = (
            df.groupBy(F.md5(F.col("text")).alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .drop("_h")
        )
        return df.join(keep, on="doc_id", how="left_semi")
    if op == "sample":
        # deterministic keyed draw: first 8 md5 hex digits as a
        # uniform in [0, 1) — reproducible in any engine
        draw = (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(step.get("salt", "s")),
                                              F.col("doc_id").cast("string"))), 1, 8),
                16, 10,
            ).cast("long")
            / F.lit(4294967296.0)
        )
        return df.filter(draw < step["rate"])
    if op == "lang_filter":
        return df.filter(F.col("lang").isin(*step["keep"]))
    raise ValueError(f"unknown curation step {op!r}")


def compile_curation_pipeline(
    spark: SparkSession, sf_dir: str, spec: dict
) -> DataFrame:
    """Spec -> ONE fused DataFrame plan; output is the curated corpus
    manifest (doc_id, lang, source, n_tokens)."""
    df = load_table(spark, sf_dir, spec.get("source", "documents"))
    for step in spec.get("steps", []):
        df = _apply_step(df, step)
    return df.select(
        "doc_id", "lang", "source",
        token_count(F.col("text")).alias("n_tokens"),
    )


def _sql_step(step: dict, prev: str, idx: int) -> tuple[str, str]:
    op = step["op"]
    name = f"s{idx}"
    if op == "quality_filter":
        body = (f"SELECT * FROM {prev} "
                f"WHERE {_SQL_QUALITY} >= {step['min_quality']}")
    elif op == "exact_dedup":
        body = (f"SELECT p.* FROM {prev} p JOIN ("
                f"SELECT MIN(doc_id) AS doc_id FROM {prev} GROUP BY md5(text)"
                f") k USING (doc_id)")
    elif op == "sample":
        salt = step.get("salt", "s")
        body = (f"SELECT * FROM {prev} WHERE "
                f"CAST(('0x' || substr(md5('{salt}' || ':' || "
                f"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
                f"/ 4294967296.0 < {step['rate']}")
    elif op == "lang_filter":
        keep = ", ".join(repr(v) for v in step["keep"])
        body = f"SELECT * FROM {prev} WHERE lang IN ({keep})"
    else:
        raise ValueError(f"unknown curation step {op!r}")
    return name, body


def sql_curation_pipeline(spec: dict) -> str:
    """The SAME spec compiled to chained DuckDB CTEs."""
    prev = spec.get("source", "documents")
    ctes = []
    for i, step in enumerate(spec.get("steps", [])):
        name, body = _sql_step(step, prev, i)
        ctes.append(f"{name} AS ({body})")
        prev = name
    with_clause = ("WITH " + ",\n    ".join(ctes) + "\n    ") if ctes else ""
    return (f"{with_clause}SELECT doc_id, lang, source, "
            f"len({_TOKENS_SQL}) AS n_tokens FROM {prev}")
