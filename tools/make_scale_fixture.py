"""Build a 10× scale fixture (~sf1) from /root/testdata/sf0.1 for the
scaling study (SCALING.md): replicate every fact table 10 times with
disjoint key spaces, keep the true dimensions (nation/region) fixed.

Replicas must not be mutual near-duplicates, or the pair-generating
operators (Jaccard, MinHash-LSH, embedding LSH) would see Σdf² grow 100×
for a 10× corpus and the study would measure fixture pathology instead of
engine scaling:

- documents: every token gets a per-replica ``_r<i>_`` suffix, so replicas
  share ZERO shingles while each replica's internal token/shingle
  statistics stay identical to the original (the delimited form is
  unambiguous — round 6's bare ``<i>`` suffix let replica 1's ``x1`` + "1"
  collide with an original ``x11``);
- embeddings: deterministic per-(replica, position) sign flips keyed by
  ``xxhash64(pos, i)`` — a diagonal ±1 orthogonal transform per replica, so
  norms and within-replica inner products are preserved EXACTLY while
  cross-replica cosine decorrelates.  (Round 6 used the parity of
  ``p*odd + i*odd`` = ``(p+i) % 2``, which gives all even-i replicas ONE
  shared sign pattern — exact cross-replica duplicates, the very pathology
  the flips exist to prevent.)

Usage: python tools/make_scale_fixture.py [out_dir] [factor] [src_dir] [tables]
(defaults /tmp/scale_sf1, 10, /root/testdata/sf0.1, all tables;
``tables`` is a comma list, e.g. ``documents,embeddings`` for the
100x decade-study fixture where only the corpus tables are needed)
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
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("make-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")

    for tbl in ("nation", "region"):
        if only is not None and tbl not in only:
            continue
        load_table(spark, src, tbl).write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")

    for tbl, keys in KEY_OFFSETS.items():
        if only is not None and tbl not in only:
            continue
        base = load_table(spark, src, tbl)
        parts = []
        for i in range(factor):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFF))
            if tbl == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1_r{i}_")
                )
            if tbl == "embeddings" and i > 0:
                # per-replica diagonal +/-1 orthogonal transform: flip
                # position p iff xxhash64(p, i) is odd — decorrelated
                # ACROSS replicas (unlike a linear parity, which repeats
                # every other replica), identical within one
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, p) -> "
                        f"CASE WHEN pmod(xxhash64(p, {i}), 2) = 1 "
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
