"""Shared helpers for the tools/ scripts (diffcheck, bench_oracle).

Single source for the fixture-table list, DuckDB view registration, and
scale-factor parsing — the two tools previously copied these verbatim, so
adding a table or changing the sf convention had to happen twice or the
tools silently diverged.
"""

from __future__ import annotations

import re
from pathlib import Path

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def connect_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with every existing fixture parquet as a view."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def parse_sf(sf_dir: str) -> float:
    """Scale factor from a path like .../sf0.1; -1.0 when absent.

    Anchored to a full trailing path component — a bare `'sf' in path` test
    would crash float() on /srv/sftest/data, and an unanchored search would
    extract 0.5 from /srv/datasf0.5.
    """
    m = re.search(r"(?:^|/)sf(\d+(?:\.\d+)?)$", sf_dir.rstrip("/"))
    return float(m.group(1)) if m else -1.0
