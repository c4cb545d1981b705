"""Scale-up harness: derive an sfN bench corpus from the driver's sf0.1.

Writes REPLICAS copies of every sf0.1 table into benchdata/sf{N} with
consistent key offsets, purely for throughput benchmarking at larger
scale (correctness is gated at sf0.01 against the driver's own data —
this derived corpus is never used for correctness claims).

Replication rules keep the workload honest at 10x:
- fact keys (custkey/orderkey/suppkey/partkey/doc_id/vec_id/event_id/
  user_id) offset by replica * 10^9 so joins stay consistent per
  replica; nation/region stay single-copy (as in TPC-H, bigger scale
  factors share the 25 nations).
- documents: replica r > 0 prefixes every token with "r{r}" — the
  within-replica near-dup structure (what the dedup queries measure) is
  preserved exactly, while cross-replica shingle overlap is zero, so
  pair volume scales linearly like a real 10x corpus, not
  quadratically like naive duplication.
- embeddings: replica r > 0 applies a deterministic per-replica
  diag(+-1) sign flip (md5-seeded per component). Sign flips preserve
  norms and within-replica cosines BIT-EXACTLY, while cross-replica
  dot products decorrelate — again the honest 10x, not 10 identical
  corpora stacked.

Usage: python tools/scale_up.py [replicas] [out_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OFFSET = 10**9

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def _sign_vec(replica: int, dim: int) -> list[int]:
    return [
        1 if hashlib.md5(f"sf-scale:{replica}:{i}".encode()).digest()[0] % 2 == 0 else -1
        for i in range(dim)
    ]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata",
        f"sf{replicas / 10:g}",
    )
    src = "/root/testdata/sf0.1"

    from cpx_etl_spark.session import get_spark

    spark = get_spark("cpx-etl-scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for t in SINGLE_COPY:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: single copy")

    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        dim = len(df.select("embedding").head()[0]) if t == "embeddings" else 0
        parts = []
        for r in range(replicas):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * OFFSET))
            if t == "documents" and r > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(F.lit(f"r{r}"), w),
                        ),
                        " ",
                    ),
                )
                # keep derived columns consistent with the mutated text
                if "n_chars" in rep.columns:
                    rep = rep.withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and r > 0:
                signs = F.array(*[F.lit(s) for s in _sign_vec(r, dim)])
                rep = rep.withColumn(
                    "embedding",
                    F.zip_with("embedding", signs, lambda x, s: x * s).cast(
                        dict(df.dtypes)["embedding"]
                    ),
                )
            parts.append(rep)
        allr = parts[0]
        for p in parts[1:]:
            allr = allr.unionAll(p)
        allr.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: x{replicas} -> {allr.count()} rows")

    spark.stop()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
