"""CLI entry point: run queries, build the warehouse, list the surface.

    python -m oltp_to_data_warehouse_pipeline_spark list
    python -m oltp_to_data_warehouse_pipeline_spark query pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain]
    python -m oltp_to_data_warehouse_pipeline_spark warehouse \
        [--sf-dir ...]  # DROP+CTAS star schema into the session catalog
    python -m oltp_to_data_warehouse_pipeline_spark sql "SELECT ... " \
        [--sf-dir ...]  # fixture tables pre-registered as views
    python -m oltp_to_data_warehouse_pipeline_spark curate --out /path \
        [--quality-min 1.0 --lang en --jaccard 0.2]  # corpus keep-list
    python -m oltp_to_data_warehouse_pipeline_spark maintain compact \
        --store /path --upto 120 [--id-col doc_id] [--target-mb 128]
    python -m oltp_to_data_warehouse_pipeline_spark maintain takedown \
        --index /idx --corpus /corpus --ids 7,21 [--id-col doc_id]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="fixture directory (default $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    parser = argparse.ArgumentParser(prog="oltp_to_data_warehouse_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list the named queries", parents=[common])

    q = sub.add_parser("query", help="run one named query", parents=[common])
    q.add_argument("name")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true", help="print the physical plan")

    sub.add_parser("warehouse", help="rebuild the star schema (DROP+CTAS)", parents=[common])

    s = sub.add_parser("sql", help="run ad-hoc SQL over the fixture views", parents=[common])
    s.add_argument("statement")
    s.add_argument("--limit", type=int, default=20)

    c = sub.add_parser(
        "curate",
        help="run the corpus-curation pipeline (quality→lang→dedup→near-dup) "
        "over the documents table and write the keep-list",
        parents=[common],
    )
    c.add_argument("--out", required=True, help="output parquet path for (doc_id, n_tokens)")
    c.add_argument("--quality-min", type=float, default=1.0)
    c.add_argument("--lang", default="en")
    c.add_argument("--jaccard", type=float, default=0.2)

    m = sub.add_parser(
        "maintain",
        help="batch-store maintenance: fold batch_id partitions below the "
        "replay horizon, or tombstone documents (takedown)",
    )
    msub = m.add_subparsers(dest="maintain_cmd", required=True)
    mc = msub.add_parser("compact", help="fold partitions batch_id < upto")
    mc.add_argument("--store", required=True, help="batch-layout store path")
    mc.add_argument("--upto", type=int, required=True, help="replay horizon")
    mc.add_argument("--id-col", default=None, help="doc id column (arms tombstone excision)")
    mc.add_argument("--target-mb", type=int, default=128)
    mt = msub.add_parser("takedown", help="tombstone documents in both ingest stores")
    mt.add_argument("--index", required=True)
    mt.add_argument("--corpus", required=True)
    mt.add_argument("--ids", required=True, help="comma-separated ids (int unless --string-ids)")
    mt.add_argument("--id-col", default="doc_id")
    mt.add_argument("--string-ids", action="store_true")

    args = parser.parse_args(argv)

    # the registry build (hundreds of query closures + oracle SQL) is only
    # needed by list/query — maintenance and SQL commands skip it
    if args.cmd in ("list", "query"):
        from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry

        queries, oracles = registry()

    if args.cmd == "list":
        for name in sorted(queries):
            print(f"{name}{'' if name in oracles else '  (no SQL oracle)'}")
        return 0

    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = queries[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "warehouse":
        from oltp_to_data_warehouse_pipeline_spark.plans.warehouse_sql import build_warehouse

        built = build_warehouse(spark, args.sf_dir)
        for t in built:
            n = spark.table(t).count()
            print(f"{t}: {n} rows")
        return 0

    if args.cmd == "sql":
        from oltp_to_data_warehouse_pipeline_spark.catalog import register_views
        from oltp_to_data_warehouse_pipeline_spark.plans.sql_surface import (
            register_sql_surface,
        )

        register_views(spark, args.sf_dir)
        # the operator library too: sqlops_* views + the sketch-algebra
        # table functions (hll_estimate_tf, kmv_estimate_tf, ...)
        register_sql_surface(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "curate":
        from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
        from oltp_to_data_warehouse_pipeline_spark.plans.curation import curate_corpus

        docs = load_table(spark, args.sf_dir, "documents")
        kept = curate_corpus(
            docs,
            quality_min=args.quality_min,
            lang=args.lang,
            jaccard_threshold=args.jaccard,
        )
        kept.write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)
        n_docs = out.count()
        n_tokens = out.agg({"n_tokens": "sum"}).first()[0]
        print(f"kept {n_docs} docs / {n_tokens} tokens -> {args.out}")
        return 0

    if args.cmd == "maintain":
        from oltp_to_data_warehouse_pipeline_spark.operators import batchstore
        from oltp_to_data_warehouse_pipeline_spark.streaming.dedup_ingest import (
            takedown,
        )

        if args.maintain_cmd == "compact":
            stats = batchstore.compact(
                spark,
                args.store,
                upto_batch_id=args.upto,
                id_col=args.id_col,
                target_bytes=args.target_mb * 1024 * 1024,
            )
            print(stats)
            return 0
        if args.maintain_cmd == "takedown":
            ids = [
                i if args.string_ids else int(i) for i in args.ids.split(",") if i
            ]
            if takedown(spark, args.index, args.corpus, ids, id_col=args.id_col):
                print(
                    f"tombstoned {len(ids)} ids in {args.index} and {args.corpus}"
                )
                return 0
            print(
                "takedown NOT recorded: a store was empty — check the "
                "--index/--corpus paths",
                file=sys.stderr,
            )
            return 1

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
