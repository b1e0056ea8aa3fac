"""DuckDB timing yardstick for the headline bench queries.

The reference publishes no performance numbers (SURVEY §6), so the only
engine-to-engine comparison available in this container is DuckDB — a
state-of-the-art single-node OLAP engine — executing the *same semantics*
(each query's oracle_sql twin) on the same parquet at the same scale
factor.  That makes the "within 2× of a competent engine" gate meaningful
for the LLM-extension queries too (the driver's BASELINE has nothing to
divide by for them).

Usage: python tools/bench_oracle.py [sf_dir] [--json out.json]

Prints one JSON line {"metric": "oracle_queries_total", "value": N,
"unit": "sec", "queries": {...}, "sf": ...} mirroring bench.py's shape.
DuckDB gets all available threads (PRAGMA threads) — an honest opponent.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import connect_views, parse_sf  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    sf = parse_sf(sf_dir)

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    oracles = entrymod.oracle_sql()
    con = connect_views(sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        sql = oracles[name]
        con.execute(sql).fetchall()  # warm (buffer parquet metadata, JIT)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    out = {
        "metric": "oracle_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    if json_out:
        Path(json_out).write_text(json.dumps(out, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
