"""CLI entry point smoke: list, query, sql (reuses the session fixture —
get_spark returns the active session inside main())."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.__main__ import main


def test_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "near_dup_clusters" in out
    # every registered query now carries a SQL oracle (ivf_topk_ann gained
    # a full-probe-exactness oracle), so no "(no SQL oracle)" markers remain
    assert "ivf_topk_ann" in out
    assert "(no SQL oracle)" not in out


def test_query_runs_and_shows(spark, capsys):
    assert main(["query", "kpi_cards", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "customers" in capsys.readouterr().out


def test_unknown_query_is_an_error(spark, capsys):
    assert main(["query", "nope", "--sf-dir", "/root/testdata/sf0.001"]) == 2


def test_adhoc_sql_over_views(spark, capsys):
    rc = main(["sql", "SELECT count(*) AS n FROM region", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "5" in capsys.readouterr().out


def test_cli_curate_writes_keep_list(tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.__main__ import main

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", "/root/testdata/sf0.001", "--out", out]) == 0
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    df = get_spark("cli-test").read.parquet(out)
    assert df.columns == ["doc_id", "n_tokens"]
    assert df.count() > 0


def test_adhoc_sql_reaches_operator_surface(spark, capsys):
    """The sql subcommand registers the operator library too: a
    SQL-only CLI user can call the sketch-algebra table functions over
    the sqlops_* views (round-9 verdict item 3, end to end)."""
    rc = main([
        "sql",
        "SELECT count(*) AS n FROM hll_estimate_tf("
        "TABLE(sqlops_hll_day_registers) PARTITION BY grp)",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n" in out and any(ch.isdigit() and ch != "0" for ch in out)


def test_cli_maintain_compact_and_takedown(spark, tmp_path, capsys):
    from oltp_to_data_warehouse_pipeline_spark.operators import batchstore
    from oltp_to_data_warehouse_pipeline_spark.streaming.dedup_ingest import (
        dedup_ingest_sink,
    )

    base = str(tmp_path / "store")
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten"
    sink(spark.createDataFrame([(1, t1)], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(2, t2)], "doc_id long, text string"), 1)

    rc = main(
        ["maintain", "takedown", "--index", f"{base}/idx",
         "--corpus", f"{base}/corpus", "--ids", "1"]
    )
    assert rc == 0 and "tombstoned 1" in capsys.readouterr().out
    rc = main(
        ["maintain", "compact", "--store", f"{base}/corpus",
         "--upto", "2", "--id-col", "doc_id"]
    )
    assert rc == 0 and "'folded': 2" in capsys.readouterr().out
    left = [
        r["doc_id"]
        for r in batchstore.read_batches(
            spark, f"{base}/corpus", id_col="doc_id"
        ).collect()
    ]
    assert left == [2]
