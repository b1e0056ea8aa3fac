"""Driver-contract smoke: entry(), queries()/oracle_sql() registry shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["region", "nation", "total_revenue", "num_orders"]
    assert df.count() > 0


def test_registry_alignment(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key has a query; every query carries an oracle (the
    # iterative IVF path is made oracle-checkable via full-probe exactness)
    assert set(oracles) <= set(qs)
    missing = set(qs) - set(oracles)
    assert missing == set(), f"queries without oracle (document if intended): {missing}"


def test_each_query_has_distinct_column_names(spark):
    """The driver sorts columns by name before hashing — duplicate names
    would silently corrupt the comparison."""
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert len(df.columns) == len(set(df.columns)), name
