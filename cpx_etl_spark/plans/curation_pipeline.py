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
    sql_quality_score_from_text,
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


_SQL_QUALITY = sql_quality_score_from_text(_TOKENS_SQL)


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
    if op == "repetition_filter":
        from cpx_etl_spark.operators.curation import repetition_stats

        n = step.get("n", 2)
        mx = step["max_dup_frac"]
        m = repetition_stats(df, "doc_id", "text", n=n)
        dup_frac = F.round(
            F.lit(1.0) - F.col("n_distinct") * F.lit(1.0) / F.col("n_total")
            - 1e-9, 6,
        )
        keep = m.filter(dup_frac <= mx).select("doc_id")
        return df.join(keep, on="doc_id", how="left_semi")
    if op == "temperature_sample":
        from cpx_etl_spark.operators.curation import temperature_sample

        kept = temperature_sample(
            df, "doc_id", step.get("group_col", "lang"), step["target_rows"]
        ).select("doc_id")
        return df.join(kept, on="doc_id", how="left_semi")
    if op == "quota_cap":
        from pyspark.sql.window import Window

        g = step.get("group_col", "source")
        w = Window.partitionBy(g).orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        keep = (
            df.select("doc_id", g)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= step["max_per_group"])
            .select("doc_id")
        )
        return df.join(keep, on="doc_id", how="left_semi")
    if op == "groupwise_split":
        g = step.get("group_col", "source")
        lo, hi = step["hash_range"]
        b = F.substring(F.md5(F.col(g)), 1, 2)
        return df.filter((b >= lo) & (b < hi))
    if op == "decontaminate":
        from cpx_etl_spark.operators.curation import decontaminate

        n = step.get("n", 4)
        is_test = (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            == step.get("eval_digit", "0")
        )
        flagged = decontaminate(
            df.filter(~is_test), df.filter(is_test), "doc_id", "text",
            n=n, threshold=step["threshold"],
        ).select("doc_id")
        return df.filter(~is_test).join(flagged, on="doc_id", how="left_anti")
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
    elif op == "repetition_filter":
        n = step.get("n", 2)
        sh = (" || ' ' || ".join(f"tk[i+{j}]" for j in range(n))).replace("tk[i+0]", "tk[i]")
        body = (
            f"SELECT p.* FROM {prev} p JOIN ("
            f"SELECT doc_id FROM ("
            f"SELECT doc_id, COUNT(*) AS nd, CAST(SUM(c) AS BIGINT) AS nt FROM ("
            f"SELECT doc_id, sh, COUNT(*) AS c FROM ("
            f"SELECT doc_id, unnest(list_transform("
            f"generate_series(1, len(tk) - {n - 1}), i -> {sh})) AS sh "
            f"FROM (SELECT doc_id, {_TOKENS_SQL} AS tk FROM {prev})"
            f") GROUP BY doc_id, sh) GROUP BY doc_id) "
            f"WHERE ROUND(1.0 - nd * 1.0 / nt - 1e-9, 6) + 0 "
            f"<= {step['max_dup_frac']}) k USING (doc_id)"
        )
    elif op == "temperature_sample":
        g = step.get("group_col", "lang")
        t = step["target_rows"]
        body = (
            f"SELECT p.* FROM {prev} p JOIN ("
            f"SELECT {g}, LEAST(1.0, {t}.0 * w / tot / n_g) AS p_keep FROM ("
            f"SELECT {g}, COUNT(*) AS n_g, SQRT(CAST(COUNT(*) AS DOUBLE)) AS w "
            f"FROM {prev} GROUP BY {g}), ("
            f"SELECT CAST(SUM(CAST(w2 AS DECIMAL(20,10))) AS DOUBLE) AS tot "
            f"FROM (SELECT SQRT(CAST(COUNT(*) AS DOUBLE)) AS w2 "
            f"FROM {prev} GROUP BY {g}))"
            f") pr USING ({g}) "
            f"WHERE CAST(('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 8)) "
            f"AS BIGINT) / 4294967296.0 < pr.p_keep"
        )
    elif op == "quota_cap":
        g = step.get("group_col", "source")
        body = (
            f"SELECT p.* FROM {prev} p JOIN ("
            f"SELECT doc_id FROM ("
            f"SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY {g} "
            f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            f"FROM {prev}) WHERE rn <= {step['max_per_group']}"
            f") k USING (doc_id)"
        )
    elif op == "groupwise_split":
        g = step.get("group_col", "source")
        lo, hi = step["hash_range"]
        body = (
            f"SELECT * FROM {prev} WHERE substr(md5({g}), 1, 2) >= '{lo}' "
            f"AND substr(md5({g}), 1, 2) < '{hi}'"
        )
    elif op == "decontaminate":
        n = step.get("n", 4)
        digit = step.get("eval_digit", "0")
        pred = f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{digit}'"
        from cpx_etl_spark.functions.text import sql_shingles

        sh = sql_shingles("string_split(text, ' ')", n)
        body = (
            f"SELECT * FROM {prev} WHERE NOT ({pred}) AND doc_id NOT IN ("
            f"SELECT tr.doc_id FROM ("
            f"SELECT doc_id, unnest({sh}) AS s FROM {prev} WHERE NOT ({pred})"
            f") tr JOIN ("
            f"SELECT DISTINCT unnest({sh}) AS s FROM {prev} WHERE {pred}"
            f") te USING (s) "
            f"GROUP BY tr.doc_id "
            f"HAVING ROUND(COUNT(*) * 1.0 / ("
            f"SELECT len({sh}) FROM {prev} x "
            f"WHERE x.doc_id = tr.doc_id) - 1e-9, 6) + 0 >= {step['threshold']})"
        )
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
