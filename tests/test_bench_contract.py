"""bench.py stdout contract: the driver parses the JSON line out of a
~2000-char tail window of stdout (round-5 forensics: BENCH_r05.json came
back "parsed": null because the line had grown to ~4.5 KB once per-query
oracle timings were embedded).  These tests fail BEFORE the driver does
when the headline set grows the line past the window."""

from __future__ import annotations

import json

import bench

TAIL_WINDOW = 2000
BUDGET = 1900  # headroom for the driver's own framing around the line


def _worst_case_line() -> str:
    out = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        # per-query stdout values are rounded to 2dp (bench.py emit path);
        # the worst case mirrors that — BENCH_DETAIL keeps 3dp off-line
        "queries": {name: 99.99 for name in bench.HEADLINE},
        "sf": 0.1,
        "oracle_total": 9999.999,
        "ratio": 99.999,
    }
    return json.dumps(out, separators=(",", ":"))


def test_stdout_line_fits_driver_tail_window():
    line = _worst_case_line()
    assert len(line) <= BUDGET, (
        f"bench stdout line would be {len(line)} chars (> {BUDGET}); the "
        "driver only parses the last ~2000 chars of stdout — move detail "
        "keys to BENCH_DETAIL.json or trim the headline set"
    )


def test_headline_names_unique():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
