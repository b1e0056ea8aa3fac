"""Adversarial skew study (round-6 verdict item 5): a deliberately
Zipf-skewed join-key fixture — ONE part carries ~30% of a 10x lineitem —
and a measured unsalted-vs-salted pair for the shuffled-hash brand-revenue
join (min-of-k walls; the salted plan's fan-out itself is pinned by
tests/test_skew.py::test_salted_plan_shuffles_on_key_and_salt).

Why this regime is the adversarial one: the hot key's ~1.8M rows land in a
single shuffle partition.  AQE's skew-join splitting (on, per session.py)
only fires past `skewedPartitionThresholdInBytes` (256 MB default); a
30%-hot partition at this scale is tens of MB — real skew, but UNDER the
runtime-rescue threshold, which is exactly when explicit salting is the
only fix.  At 100 TB the same key blows past the threshold and AQE splits
SMJ/SHJ partitions too; salting stays the deterministic answer when the
skew sits under AQE's radar or in operators AQE cannot split.

Builds /tmp/skew_fixture (lineitem with remapped l_partkey + the part
table), measures min-of-k for both plans, prints one JSON line each, and
writes SKEW_STUDY.json.

Round-10 addition (round-9 verdict item 4): a Zipf-df BOILERPLATE corpus
for the span-dedup postings self-join — three boilerplate passages
injected into 30% / 10% / 3% of a 10x documents table, so the head
shingles' posting lists hold thousands of occurrences.  The section
measures duplicated_span_pairs at the production cap (20) vs a 10x
looser one (200), and reports the UNCAPPED pair expansion Σ df² the join
would otherwise have to materialize (computed from the frequency
relation — no need to run the explosion to quantify it).  The partition
bound itself is pinned by tests/test_skew.py (per-key postings ≤ cap ⇒
per-key join output ≤ cap², independent of how hot the raw key is).

Usage: python tools/skew_study.py [k] [section]  (section: join|spans|all,
default all; results MERGE into SKEW_STUDY.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/tmp/scale_sf1"  # 10x fixture (tools/make_scale_fixture.py)
OUT = "/tmp/skew_fixture"
HOT_SHARE = 0.3


#: boilerplate passages and the % of docs carrying each (Zipf-ish head)
BOILERPLATE = [
    ("subscribe to our newsletter today for the latest updates special "
     "offers and exclusive member only content delivered to you", 30),
    ("all rights reserved unauthorized reproduction or distribution of "
     "this material is strictly prohibited by applicable law", 10),
    ("the opinions expressed in this article are those of the author "
     "and do not necessarily reflect official policy", 3),
]


def _boilerplate_corpus(spark, src: str):
    """documents with Zipf-df boilerplate PREPENDED deterministically:
    doc buckets by xxhash64(doc_id) pick which passages a doc carries."""
    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table

    d = load_table(spark, src, "documents").select("doc_id", "text")
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(100))
    pieces = []
    lo = 0
    for passage, pct in BOILERPLATE:
        pieces.append(
            F.when((bucket >= lo) & (bucket < lo + pct), F.lit(passage))
        )
        lo += pct
    return d.select(
        "doc_id",
        F.concat_ws(
            " ", *[p for p in pieces], F.col("text")
        ).alias("text"),
    )


def spans_skew_study(spark, k: int) -> dict:
    import time as _t

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.operators import spans

    d = _boilerplate_corpus(spark, SRC)
    n_docs = d.count()

    # the frequency relation quantifies the adversary and the would-be
    # explosion WITHOUT running it: Σ df² over every duplicated shingle
    sh = spans.positional_shingles(d, "doc_id", "text", 3)
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    stats = freq.where(F.col("df") >= 2).agg(
        F.max("df").alias("max_df"),
        F.sum(F.col("df") * F.col("df")).cast("bigint").alias("sum_df_sq"),
    ).first()

    out: dict = {
        "n_docs": n_docs,
        "hot_max_postings": int(stats["max_df"]),
        "uncapped_pair_expansion": int(stats["sum_df_sq"]),
    }
    for cap in (20, 200):
        audit = spans.span_df_cap_audit(d, "doc_id", "text", 3, cap).first()
        run = lambda: spans.duplicated_span_pairs(  # noqa: E731
            d, "doc_id", "text", 3, 8, cap
        ).write.format("noop").mode("overwrite").save()
        run()  # warm
        best = float("inf")
        for _ in range(k):
            t0 = _t.time()
            run()
            best = min(best, _t.time() - t0)
        out[f"cap_{cap}"] = {
            "sec": round(best, 2),
            "pair_expansion": int(audit["pair_expansion"]),
            "capped_shingles": int(audit["capped_shingles"]),
            "capped_postings": int(audit["capped_postings"]),
        }
        print(json.dumps({f"spans_cap_{cap}": out[f"cap_{cap}"]}), flush=True)
    out["expansion_shrink_at_20"] = (
        round(out["uncapped_pair_expansion"] / out["cap_20"]["pair_expansion"], 1)
        if out["cap_20"]["pair_expansion"]
        else None
    )
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if k < 1:
        # k=0 would leave best=inf and json.dumps would emit "sec": Infinity
        # (non-standard JSON that breaks jq and strict parsers downstream).
        # scale_decades.py has a real k=0 mode because a single 1000x run is
        # 10-30 min; skew-study runs are minutes, so just require k>=1.
        sys.exit("skew_study: k must be >= 1 (k=0 is a scale_decades-only mode)")
    section = sys.argv[2] if len(sys.argv) > 2 else "all"

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.operators.skew import salted_join
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("skew-study")
    spark.sparkContext.setLogLevel("ERROR")

    prior: dict = {}
    if Path("SKEW_STUDY.json").exists():  # merge, don't clobber
        prior = json.loads(Path("SKEW_STUDY.json").read_text())

    if section in ("spans", "all"):
        prior["spans_postings"] = spans_skew_study(spark, k)
        Path("SKEW_STUDY.json").write_text(json.dumps(prior, indent=2) + "\n")
        print("wrote SKEW_STUDY.json (spans_postings)")
        if section == "spans":
            return

    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        li = load_table(spark, SRC, "lineitem")
        hot = load_table(spark, SRC, "part").select(F.min("p_partkey")).collect()[0][0]
        # deterministic 30% of rows get the hot part key
        li = li.withColumn(
            "l_partkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < int(HOT_SHARE * 10),
                F.lit(hot),
            ).otherwise(F.col("l_partkey")),
        )
        li.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
        load_table(spark, SRC, "part").write.mode("overwrite").parquet(f"{OUT}/part.parquet")
        print(f"fixture: hot part {hot} takes {HOT_SHARE:.0%} of lineitem", flush=True)

    li = load_table(spark, OUT, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, OUT, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (1 - F.col("l_discount").cast("decimal(8,4)")))

    def agg(joined):
        return joined.groupBy("p_brand").agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )

    # Both sides run under the SAME session confs (AQE + skewJoin ON) and
    # the SAME shuffle_hash hint: salting is the only variable.  The hint
    # mirrors the operator's broadcast-infeasible premise — at 100 TB the
    # dimension doesn't broadcast; letting the baseline broadcast 20k parts
    # would measure broadcast-vs-salt, not skew.
    plans = {
        "unsalted_shj": lambda: agg(li.join(part.hint("shuffle_hash"), "l_partkey")),
        "salted_8": lambda: agg(salted_join(li, part, on="l_partkey", salts=8)),
        "salted_32": lambda: agg(salted_join(li, part, on="l_partkey", salts=32)),
    }

    def drop_persisted() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    out: dict = prior
    # parity first: salting must not change a row
    base = {tuple(r) for r in plans["unsalted_shj"]().collect()}
    for name in ("salted_8", "salted_32"):
        assert {tuple(r) for r in plans[name]().collect()} == base, f"{name} diverged!"
    out["parity"] = f"ok ({len(base)} brands)"

    for name, build in plans.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        drop_persisted()
        best = float("inf")
        for _ in range(k):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            drop_persisted()
        out[name] = {"sec": round(best, 2)}
        print(json.dumps({name: out[name]}), flush=True)

    out["speedup_8"] = round(out["unsalted_shj"]["sec"] / out["salted_8"]["sec"], 2)
    out["speedup_32"] = round(out["unsalted_shj"]["sec"] / out["salted_32"]["sec"], 2)
    Path("SKEW_STUDY.json").write_text(json.dumps(out, indent=2) + "\n")
    print("wrote SKEW_STUDY.json")


if __name__ == "__main__":
    main()
