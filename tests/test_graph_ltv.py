"""Independent oracles for the round-5 graph/LTV queries.

Both queries are oracle-twinned (strict diffcheck), but the DuckDB twin
runs the SAME algorithm — a shared blind spot would pass the hash check.
These tests re-derive the answers with a deliberately different method:
pure-Python set enumeration for the triangle query, and exact Fraction
arithmetic (plus a hypothesis sweep) for the integer half-up rounding
formula the LTV and clustering-coefficient outputs rely on.
"""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry

SF_DIR = "/root/testdata/sf0.001"


def _half_up(n: int, d: int) -> int:
    """Round-half-up of n/d for positive ints, via exact Fraction."""
    f = Fraction(n, d)
    whole, rem = divmod(f.numerator, f.denominator)
    return whole + (1 if 2 * rem >= f.denominator else 0)


@given(st.integers(min_value=0, max_value=10**15), st.integers(min_value=1, max_value=10**9))
@settings(max_examples=300, deadline=None)
def test_integer_half_up_formula(n, d):
    """(2n + d) DIV (2d) — the engine-portable rounding used by
    cohort_revenue_ltv (4 dp LTV) and brand_graph_triangles (clustering
    coefficient) — must equal exact rational round-half-up for every
    positive (n, d)."""
    assert (2 * n + d) // (2 * d) == _half_up(n, d)


def test_triangles_match_pure_python_bruteforce(spark):
    """brand_graph_triangles vs an independent enumeration: edges derived
    with plain SQL counts + Python integer comparisons, triangles counted
    with itertools.combinations over adjacency sets — no joins, no window
    functions, no shared code path with either engine's query."""
    con = duckdb.connect()
    ib = con.execute(
        f"""
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/part.parquet' p ON p.p_partkey = l.l_partkey
        """
    ).fetchall()
    orders: dict[int, set[str]] = {}
    for ok, b in ib:
        orders.setdefault(ok, set()).add(b)
    n_orders = len(orders)
    marg: dict[str, int] = {}
    pair_cnt: dict[tuple[str, str], int] = {}
    for brands in orders.values():
        for b in brands:
            marg[b] = marg.get(b, 0) + 1
        for a, b in combinations(sorted(brands), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    # edge iff positively associated, exact integer test (as the query)
    edges = {
        (a, b)
        for (a, b), n_ab in pair_cnt.items()
        if n_ab * n_orders > marg[a] * marg[b]
    }
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_per = {v: 0 for v in adj}
    for v, nbrs in adj.items():
        # each unordered neighbor pair {x, y} with an x-y edge is exactly
        # one triangle through v
        for x, y in combinations(sorted(nbrs), 2):
            if y in adj.get(x, ()):
                tri_per[v] += 1
    expected = {v: (len(adj[v]), tri_per[v]) for v in adj}

    q, _ = registry()
    rows = q["brand_graph_triangles"](spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        deg, tri = expected[r["brand"]]
        assert r["degree"] == deg, r
        assert r["n_triangles"] == tri, r
        if deg >= 2:
            e4 = (40000 * tri + deg * (deg - 1)) // (2 * deg * (deg - 1))
            assert r["clustering_coeff"] == pytest.approx(e4 / 10000.0)
        else:
            assert r["clustering_coeff"] == 0.0


def test_pagerank_matches_pure_python_fixed_point(spark):
    """brand_pagerank vs a dict-based replay of the same fixed-point
    recurrence (nanorank integers, floor-division contributions) computed
    without any SQL engine — catches a shared Spark/DuckDB formulation
    blind spot and pins the trajectory bit-for-bit."""
    con = duckdb.connect()
    ib = con.execute(
        f"""
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/part.parquet' p ON p.p_partkey = l.l_partkey
        """
    ).fetchall()
    orders: dict[int, set[str]] = {}
    for ok, b in ib:
        orders.setdefault(ok, set()).add(b)
    n_orders = len(orders)
    marg: dict[str, int] = {}
    pair_cnt: dict[tuple[str, str], int] = {}
    for brands in orders.values():
        for b in brands:
            marg[b] = marg.get(b, 0) + 1
        for a, b in combinations(sorted(brands), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    adj: dict[str, set[str]] = {}
    for (a, b), n_ab in pair_cnt.items():
        if n_ab * n_orders > marg[a] * marg[b]:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    nv = len(adj)
    deg = {v: len(ns) for v, ns in adj.items()}
    rank = {v: (2_000_000_000 + nv) // (2 * nv) for v in adj}
    base = (30_000_000_000 + 100 * nv) // (200 * nv)
    for _ in range(3):
        s = {v: 0 for v in adj}
        for u, ns in adj.items():
            c = rank[u] // deg[u]
            for v in ns:
                s[v] += c
        rank = {v: base + (170 * s[v] + 100) // 200 for v in adj}
    q, _ = registry()
    got = q["brand_pagerank"](spark, SF_DIR).collect()
    assert len(got) == nv
    for row in got:
        assert row["degree"] == deg[row["brand"]], row
        assert row["pagerank"] == pytest.approx(rank[row["brand"]] / 1e9), row


def test_cohort_ltv_matches_pure_python(spark):
    """cohort_revenue_ltv vs a dict-fold re-derivation in exact integer
    cents (no SQL at all beyond the parquet read)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR}/orders.parquet'
        """
    ).fetchall()
    first: dict[int, object] = {}
    for ck, m, _ in rows:
        if ck not in first or m < first[ck]:
            first[ck] = m
    agg: dict[tuple[str, int], list] = {}
    for ck, m, cents in rows:
        cm = first[ck]
        age = (m.year - cm.year) * 12 + (m.month - cm.month)
        key = (f"{cm.year:04d}-{cm.month:02d}", age)
        cell = agg.setdefault(key, [set(), 0])
        cell[0].add(ck)
        cell[1] += cents
    out = {}
    for cohort in {k[0] for k in agg}:
        ages = sorted(a for c, a in agg if c == cohort)
        size = len(agg[(cohort, 0)][0])
        cum = 0
        for a in ages:
            custs, cents = agg[(cohort, a)]
            cum += cents
            ltv_e4 = (200 * cum + size) // (2 * size)
            out[(cohort, a)] = (len(custs), cents, ltv_e4 / 10000.0)
    q, _ = registry()
    got = q["cohort_revenue_ltv"](spark, SF_DIR).collect()
    assert len(got) == len(out)
    for r in got:
        n_active, cents, ltv = out[(r["cohort_month"], r["age"])]
        assert r["n_active"] == n_active, r
        assert r["revenue"] == pytest.approx(round(cents / 100.0, 2))
        assert r["cum_ltv_per_customer"] == pytest.approx(ltv), r
