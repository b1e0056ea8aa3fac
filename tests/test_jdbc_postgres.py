"""PG-dialect contract tests for S1/S3/S6 (VERDICT r7 item 6) — the
Postgres specifics the embedded-Derby round-trip can't encode:

- JSONB ``raw_data`` round-trip (reference `mongo_postgres_cdc.py:261`
  stores the full message as JSONB);
- ``ON CONFLICT`` upsert parity: the reference's
  `mongo_postgres_cdc.py:359-380` INSERT … ON CONFLICT (pk) DO UPDATE
  must produce the same final table state as this engine's
  ``upsert_parquet`` LWW semantics over the same event sequence;
- TEXT type width: Spark's PG dialect maps StringType → TEXT, so long
  strings must survive unclipped (Derby's default VARCHAR would not).

GATED: runs only when ``SPARK_GRAFT_PG_URL`` points at a reachable
Postgres (``jdbc:postgresql://host:port/db``) AND the PostgreSQL JDBC
driver is on the Spark classpath (launch with
``--jars postgresql-<ver>.jar`` or ``--packages org.postgresql:postgresql``).
Optional ``SPARK_GRAFT_PG_USER`` / ``SPARK_GRAFT_PG_PASSWORD``.  The CI
container has no Postgres and no network, so the suite skips there; the
wiring is proven wherever a PG exists (testcontainers-style gating, the
same pattern as the protobuf-gated TWS stream test).
"""

from __future__ import annotations

import json
import os

import pytest

from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import (
    JdbcConfig,
    read_table,
    write_append,
)

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL", "")

pytestmark = pytest.mark.skipif(
    not PG_URL, reason="set SPARK_GRAFT_PG_URL=jdbc:postgresql://… to run"
)


@pytest.fixture()
def cfg():
    return JdbcConfig(
        url=PG_URL,
        user=os.environ.get("SPARK_GRAFT_PG_USER", ""),
        password=os.environ.get("SPARK_GRAFT_PG_PASSWORD", ""),
        driver="org.postgresql.Driver",
    )


@pytest.fixture()
def pg_exec(spark, cfg):
    """Server-side SQL executor over the same JDBC driver (py4j
    DriverManager) — for DDL and the reference's ON CONFLICT statement,
    which Spark's JDBC writer cannot emit."""
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    if cfg.user:
        props.setProperty("user", cfg.user)
        props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    st = conn.createStatement()
    yield st.execute
    st.close()
    conn.close()


def test_jsonb_raw_data_round_trip(spark, cfg, pg_exec):
    """`mongo_postgres_cdc.py:261`: raw_data lands as JSONB.  Write the
    normalizer's (pk, raw_data) shape into a JSONB column via
    createTableColumnTypes, read it back through S1, and verify the JSON
    survives semantically (PG normalizes JSONB key order/whitespace, so
    compare parsed values, not bytes)."""
    pg_exec("DROP TABLE IF EXISTS sg_jsonb_rt")
    docs = [("k1", {"a": 1, "b": {"c": [1, 2, 3]}}), ("k2", {"x": None, "y": "züß"})]
    df = spark.createDataFrame(
        [(k, json.dumps(v)) for k, v in docs], "pk string, raw_data string"
    )
    (
        df.write.format("jdbc")
        .mode("overwrite")
        .option("url", cfg.url)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
        .option("dbtable", "sg_jsonb_rt")
        .option("createTableColumnTypes", "pk VARCHAR(32), raw_data JSONB")
        .option("stringtype", "unspecified")  # let PG cast text → jsonb
        .save()
    )
    back = {
        r["pk"]: json.loads(r["raw_data"])
        for r in read_table(spark, cfg, "sg_jsonb_rt").collect()
    }
    assert back == dict(docs)
    # and the server can INDEX into it — proof it landed as jsonb, not text
    pg_exec("SELECT raw_data->'b'->'c'->0 FROM sg_jsonb_rt")


def test_on_conflict_parity_with_upsert_parquet(spark, cfg, pg_exec, tmp_path):
    """The reference upsert (`mongo_postgres_cdc.py:359-380`) and this
    engine's S6 LWW upsert must converge to the SAME final state for the
    same ordered event sequence — including a tombstone."""
    from oltp_to_data_warehouse_pipeline_spark.sources.upsert import (
        read_upserted,
        upsert_parquet,
    )

    events = [  # (seq, pk, name, score, deleted)
        (1, "u1", "a", 10, False),
        (2, "u2", "b", 20, False),
        (3, "u1", "a2", 11, False),  # update wins
        (4, "u3", "c", 30, False),
        (5, "u2", None, None, True),  # tombstone
    ]
    # reference semantics, server-side
    pg_exec("DROP TABLE IF EXISTS sg_upsert")
    pg_exec(
        "CREATE TABLE sg_upsert (pk VARCHAR(16) PRIMARY KEY, name TEXT, score BIGINT)"
    )
    for _seq, pk, name, score, deleted in events:
        if deleted:
            pg_exec(f"DELETE FROM sg_upsert WHERE pk = '{pk}'")
        else:
            pg_exec(
                f"INSERT INTO sg_upsert VALUES ('{pk}', '{name}', {score}) "
                "ON CONFLICT (pk) DO UPDATE SET name = EXCLUDED.name, "
                "score = EXCLUDED.score"
            )
    want = {
        (r["pk"], r["name"], r["score"])
        for r in read_table(spark, cfg, "sg_upsert").collect()
    }
    # engine semantics, one set-oriented batch
    path = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        spark.createDataFrame(
            events, "seq long, pk string, name string, score long, _deleted boolean"
        ),
        path,
        key="pk",
        order_cols=["seq"],
    )
    got = {
        (r["pk"], r["name"], r["score"])
        for r in read_upserted(spark, path, delete_col="_deleted")
        .select("pk", "name", "score")
        .collect()
    }
    assert got == want == {("u1", "a2", 11), ("u3", "c", 30)}


def test_text_columns_survive_long_strings(spark, cfg, pg_exec):
    """StringType → TEXT under the PG dialect: a 100k-char document must
    round-trip unclipped (the reference stores full documents/messages in
    text columns)."""
    pg_exec("DROP TABLE IF EXISTS sg_text_width")
    body = "x" * 100_000 + "Ω"
    write_append(
        spark.createDataFrame([("d1", body)], "pk string, body string"),
        cfg,
        "sg_text_width",
    )
    back = read_table(spark, cfg, "sg_text_width").collect()
    assert len(back) == 1 and back[0]["body"] == body and len(back[0]["body"]) == 100_001


def test_write_upsert_postgres_dialect_end_to_end(spark, cfg, pg_exec):
    """S6 over a REAL warehouse: write_upsert(dialect='postgres') —
    create, replay-idempotence, stale-version rejection, tombstone
    delete.  The target needs a unique index on the key, which the
    dialect documents; created here the way a production user would."""
    from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import (
        write_upsert,
    )

    pg_exec("DROP TABLE IF EXISTS wh_upsert")
    pg_exec(
        'CREATE TABLE wh_upsert ("id" BIGINT PRIMARY KEY, "amount" DOUBLE '
        'PRECISION, "ver" BIGINT)'
    )
    schema = "id long, amount double, ver long, is_del boolean"
    b1 = spark.createDataFrame(
        [(1, 10.0, 1, False), (2, 20.0, 1, False)], schema
    )
    for _ in range(2):  # replay: exactly-once effect
        write_upsert(
            b1, cfg, "wh_upsert", keys=["id"], order_cols=["ver"],
            delete_col="is_del", dialect="postgres",
        )
        got = sorted(
            (r["id"], r["amount"], r["ver"])
            for r in read_table(spark, cfg, "wh_upsert").collect()
        )
        assert got == [(1, 10.0, 1), (2, 20.0, 1)]

    b2 = spark.createDataFrame(
        [(1, 11.0, 2, False), (2, 0.0, 2, True), (3, 30.0, 1, False)], schema
    )
    write_upsert(
        b2, cfg, "wh_upsert", keys=["id"], order_cols=["ver"],
        delete_col="is_del", dialect="postgres",
    )
    got = sorted(
        (r["id"], r["amount"], r["ver"])
        for r in read_table(spark, cfg, "wh_upsert").collect()
    )
    assert got == [(1, 11.0, 2), (3, 30.0, 1)]

    # stale replay of the older batch: semantic no-op for surviving keys
    write_upsert(
        spark.createDataFrame([(1, 99.0, 1, False)], schema),
        cfg, "wh_upsert", keys=["id"], order_cols=["ver"],
        delete_col="is_del", dialect="postgres",
    )
    got = sorted(
        (r["id"], r["amount"])
        for r in read_table(spark, cfg, "wh_upsert").collect()
    )
    assert (1, 11.0) in got
    pg_exec("DROP TABLE IF EXISTS wh_upsert")


def test_write_upsert_autocreates_unique_index(spark, cfg, pg_exec):
    """ADVICE r9 (medium): Spark's JDBC writer creates tables with NO
    constraints, so a write_upsert-auto-created Postgres target used to
    fail every batch after the first with 'no unique or exclusion
    constraint matching the ON CONFLICT specification'.  The first-write
    path must now create the keys' unique index itself; the second batch
    exercises the ON CONFLICT merge against it."""
    from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import write_upsert

    pg_exec("DROP TABLE IF EXISTS wh_auto")
    schema = "id long, amount double, ver long, is_del boolean"
    kw = dict(
        keys=["id"], order_cols=["ver"], delete_col="is_del",
        dialect="postgres",
    )
    write_upsert(
        spark.createDataFrame([(1, 10.0, 1, False)], schema),
        cfg, "wh_auto", **kw,
    )  # auto-create + CREATE UNIQUE INDEX
    write_upsert(
        spark.createDataFrame([(1, 11.0, 2, False), (2, 20.0, 1, False)], schema),
        cfg, "wh_auto", **kw,
    )  # merge path: would raise without the index
    got = sorted(
        (r["id"], r["amount"], r["ver"])
        for r in read_table(spark, cfg, "wh_auto").collect()
    )
    assert got == [(1, 11.0, 2), (2, 20.0, 1)]
    pg_exec("DROP TABLE IF EXISTS wh_auto")


def test_tombstone_retention_postgres(spark, cfg, pg_exec):
    """tombstones=True on the postgres dialect: delete, then replay the
    pre-delete update — the key must stay absent (the resurrect-on-replay
    hole the default mode documents)."""
    from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import write_upsert

    pg_exec("DROP TABLE IF EXISTS wh_tomb")
    pg_exec("DROP TABLE IF EXISTS wh_tomb__tombstones")
    schema = "id long, amount double, ver long, is_del boolean"
    kw = dict(
        keys=["id"], order_cols=["ver"], delete_col="is_del",
        dialect="postgres", tombstones=True,
    )
    b1 = spark.createDataFrame([(1, 10.0, 1, False)], schema)
    write_upsert(b1, cfg, "wh_tomb", **kw)
    write_upsert(
        spark.createDataFrame([(1, 0.0, 2, True)], schema), cfg, "wh_tomb", **kw
    )
    write_upsert(b1, cfg, "wh_tomb", **kw)  # pre-delete replay
    assert read_table(spark, cfg, "wh_tomb").count() == 0
    pg_exec("DROP TABLE IF EXISTS wh_tomb")
    pg_exec("DROP TABLE IF EXISTS wh_tomb__tombstones")


def test_epoch_guard_postgres(spark, cfg, pg_exec):
    """The <table>__epochs exactly-once-work guard on the postgres
    dialect: a replayed (checkpoint_id, batch_id) with poisoned data must
    be skipped entirely (state unchanged), and each committed batch
    leaves exactly one audit row."""
    from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import (
        read_table as _rt,
        write_upsert,
    )

    pg_exec("DROP TABLE IF EXISTS wh_epoch")
    pg_exec("DROP TABLE IF EXISTS wh_epoch__epochs")
    schema = "id long, amount double, ver long"
    kw = dict(keys=["id"], order_cols=["ver"], dialect="postgres")
    b1 = spark.createDataFrame([(1, 10.0, 1), (2, 20.0, 1)], schema)
    b2 = spark.createDataFrame([(1, 11.0, 2), (3, 30.0, 1)], schema)
    poison = spark.createDataFrame([(1, 999.0, 99)], schema)

    write_upsert(b1, cfg, "wh_epoch", epoch=("ck", 0), **kw)
    write_upsert(b2, cfg, "wh_epoch", epoch=("ck", 1), **kw)
    want = [(1, 11.0, 2), (2, 20.0, 1), (3, 30.0, 1)]
    state = lambda: sorted(  # noqa: E731
        (r["id"], r["amount"], r["ver"])
        for r in _rt(spark, cfg, "wh_epoch").collect()
    )
    assert state() == want
    write_upsert(poison, cfg, "wh_epoch", epoch=("ck", 0), **kw)
    write_upsert(poison, cfg, "wh_epoch", epoch=("ck", 1), **kw)
    assert state() == want
    eps = sorted(
        tuple(r) for r in _rt(spark, cfg, "wh_epoch__epochs").collect()
    )
    assert eps == [("ck", 0), ("ck", 1)]
