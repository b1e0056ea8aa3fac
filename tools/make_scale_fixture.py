"""Build a 10× scale fixture (~sf1) from /root/testdata/sf0.1 for the
scaling study (SCALING.md): replicate every fact table 10 times with
disjoint key spaces, keep the true dimensions (nation/region) fixed.

Replicas must not be mutual near-duplicates, or the pair-generating
operators (Jaccard, MinHash-LSH, embedding LSH) would see Σdf² grow 100×
for a 10× corpus and the study would measure fixture pathology instead of
engine scaling:

- documents: every token gets a per-replica suffix, so replicas share ZERO
  shingles while each replica's internal token/shingle statistics stay
  identical to the original;
- embeddings: deterministic per-(replica, position) sign flips — norms and
  within-replica geometry preserved, cross-replica cosine decorrelated.

Usage: python tools/make_scale_fixture.py [out_dir] [factor]
(defaults /tmp/scale_sf1, 10)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

KEY_OFFSETS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("make-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")

    for tbl in ("nation", "region"):
        load_table(spark, SRC, tbl).write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")

    for tbl, keys in KEY_OFFSETS.items():
        base = load_table(spark, SRC, tbl)
        parts = []
        for i in range(factor):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFF))
            if tbl == "documents" and i > 0:
                df = df.withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1{i}"))
            if tbl == "embeddings" and i > 0:
                # sign flip when (pos * 2654435761 + i * 40503) is odd
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, p) -> "
                        f"CASE WHEN pmod(p * 2654435761 + {i} * 40503, 2) = 1 "
                        "THEN -x ELSE x END)"
                    ),
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # events.ts arrives as TIMESTAMP after the catalog's nanos
        # normalization; write it back out as NANOS-free micros parquet
        u.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(f"{tbl}: {u.count()} rows -> {out}/{tbl}.parquet", flush=True)


if __name__ == "__main__":
    main()
