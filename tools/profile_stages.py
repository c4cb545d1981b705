"""Stage-level profile of q_pipeline_e2e and q_corpus_curation (VERDICT
r3 item 5): time each prefix of the pipeline at a given sf dir to show
whether the ~7-9x total at 10x data hides anything superlinear.

Usage: python tools/profile_stages.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cpx_etl_spark.functions.text import (
    STOPWORDS,
    punct_count,
    quality_score,
    stopword_count,
    sum_token_lengths,
    token_count,
    tokens,
)
from cpx_etl_spark.session import get_spark
from cpx_etl_spark.sources import load_table


def timed(label: str, df, passes: int) -> float:
    best = None
    for _ in range(passes):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:40s} {best:7.2f}s")
    return best


def curation_stages(spark, sf_dir: str, passes: int) -> None:
    print("q_corpus_curation stages:")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    timed("scan only", docs, passes)

    t = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(
            sum_token_lengths(t) / token_count(F.col("text")),
            stopword_count(t, STOPWORDS["en"]) / token_count(F.col("text")),
            punct_count(F.col("text")) / F.length("text"),
        ).alias("quality"),
    )
    timed("+ quality scoring", scored, passes)

    kept = scored.filter(
        (F.col("quality") >= 0.55) & F.col("n_tokens").between(20, 200)
    )
    timed("+ threshold filter", kept, passes)

    survivors = (
        kept.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    timed("+ dedup groupBy", survivors, passes)

    full = kept.join(survivors, on="doc_id", how="left_semi").select(
        "doc_id", "n_tokens", "quality"
    )
    timed("+ survivor semi-join (full query)", full, passes)


def pipeline_stages(spark, sf_dir: str, passes: int) -> None:
    from cpx_etl_spark.functions.schema_apply import schema_apply
    from cpx_etl_spark.operators.routing import route
    from cpx_etl_spark.operators.validation import validate

    print("q_pipeline_e2e stages:")
    ev = load_table(spark, sf_dir, "events")
    timed("scan only", ev, passes)

    derived = ev.withColumn("k", F.get_json_object(F.col("props"), "$.k"))
    timed("+ json derive", derived, passes)

    coerced = schema_apply(derived, {"k": "Number"})
    timed("+ schema_apply", coerced, passes)

    validated = validate(
        coerced, {"value": [("between", 0, 100)], "k": [("not_null",)]}
    )
    timed("+ validate", validated, passes)

    routed = route(
        validated,
        [("purchase", {"event_type": ["purchase"]}), ("click", {"event_type": ["click"]})],
    )
    timed("+ route", routed, passes)

    agg = (
        routed.filter(F.col("_valid"))
        .groupBy("_route")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )
    timed("+ final agg (full query)", agg, passes)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cpx-etl-profile", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"profiling at {sf_dir} (min of {passes})")
    pipeline_stages(spark, sf_dir, passes)
    curation_stages(spark, sf_dir, passes)


if __name__ == "__main__":
    main()
