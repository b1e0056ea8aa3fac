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
    # per-query stdout values are rounded to 2dp below 10 s and 1dp at
    # 10..99.9 s (bench.py emit path — both are 4-char values, so ANY
    # number of queries crossing 10 s leaves the line width unchanged;
    # round-11 advisor finding: the old 2dp-everywhere emit let >8 slow
    # queries silently engage the trim loop).  BENCH_DETAIL keeps 3dp
    # off-line.  The worst case here is EVERY query at the 4-char width
    # (all-time per-query driver max is 5.9 s; 99.9 covers a 17x-slower
    # host) — strictly harsher than the old 8-slots-at-5-chars budget.
    # Past 100 s/query bench.py's runtime trim loop sheds the FASTEST
    # entries until the line fits, so the contract degrades gracefully
    # rather than going unparsed.
    vals = {name: 99.9 for name in bench.HEADLINE}
    out = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": vals,
        "sf": 0.1,
        "oracle_total": 9999.999,
        "ratio": 99.999,
        # round-12 contamination markers (bench.py emit path): "ctl" is
        # the control query's wall, "lav" the [start, end] 1-min loadavg
        # stamps — on the stdout line so the driver can discard a loaded
        # window from BENCH_r{N}.json alone
        "ctl": 9.99,
        "lav": [99.9, 99.9],
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


# ---------------------------------------------------------------------------
# Per-query wall-time regression gate (round-9 verdict item 5, finishing
# round-8 item 7): BENCH_DETAIL records spark/oracle ratios, but nothing
# failed when a query's own wall-time grew round-over-round.  This test
# compares the two most recent driver-recorded BENCH_r{N}.json files —
# own-time, not DuckDB-ratio, so oracle-side noise can't mask or fake a
# regression — and also checks the freshest local BENCH_DETAIL.json
# against the last recorded round, so a regression introduced THIS round
# fails here before the driver ever records it.
# ---------------------------------------------------------------------------

GROWTH = 1.5     # flag when a query's SHARE of the run grows > 1.5x ...
SLACK_SEC = 0.75  # ... AND its absolute wall grew by more than this
# Share-normalized on purpose: shared-host slowness inflates every query
# together (measured 45.8 s -> 54.3 s across one afternoon with zero code
# changes to the flagged queries), so raw-wall thresholds fire on load,
# not regressions.  A structural regression grows a query RELATIVE to its
# peers; uniform inflation cancels in the share.


def _bench_rounds():
    import pathlib
    import re

    rounds = []
    for p in sorted(pathlib.Path(__file__).resolve().parent.parent.glob("BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        parsed = json.loads(p.read_text()).get("parsed")
        if parsed and parsed.get("queries"):
            rounds.append((int(m.group(1)), p, parsed))
    return sorted(rounds)


def _regressions(old: dict, new: dict) -> dict[str, str]:
    common = [n for n in new if n in old]
    if not common:
        return {}
    old_total = sum(old[n] for n in common) or 1.0
    new_total = sum(new[n] for n in common) or 1.0
    out: dict[str, str] = {}
    for name in common:
        share_old = old[name] / old_total
        share_new = new[name] / new_total
        if share_new > GROWTH * share_old and new[name] - old[name] > SLACK_SEC:
            out[name] = (
                f"{name}: {old[name]:.2f}s ({share_old:.1%}) -> "
                f"{new[name]:.2f}s ({share_new:.1%})"
            )
    return out


def test_no_per_query_walltime_regression_between_rounds():
    # A driver round is ONE bench window on a shared host; round-10
    # forensics proved a single window can inflate individual queries 2x
    # with zero code change (driver r10 recorded order_value_bootstrap_ci
    # 2.08s / session_concurrency_peaks 2.64s; min-of-5 at the same HEAD
    # the next session: 1.11s / 1.07s — and share-normalization did not
    # cancel it, because disk contention hits sort-heavy plans
    # non-uniformly).  A structural regression, by contrast, persists
    # across driver rounds.  So with >=3 recorded rounds, flag a query
    # only when it regresses vs a COMMON baseline (two rounds back) in
    # BOTH of the two most recent driver rounds — two independent bench
    # windows must agree before the repo goes red.  Same-round detection
    # is not lost: the local-BENCH_DETAIL gate below fails at builder
    # close, before the driver ever records the regressed round.
    rounds = _bench_rounds()
    if len(rounds) < 2:
        return  # round 1: nothing to compare
    if len(rounds) == 2:
        (_, _, prev), (_, _, last) = rounds
        bad = _regressions(prev["queries"], last["queries"])
    else:
        (_, _, base), (_, _, mid), (_, _, last) = rounds[-3], rounds[-2], rounds[-1]
        bad_last = _regressions(base["queries"], last["queries"])
        bad_mid = _regressions(base["queries"], mid["queries"])
        bad = {n: msg for n, msg in bad_last.items() if n in bad_mid}
        # queries too young to exist in the base round would otherwise be
        # exempt entirely (round-11 review); for those, fall back to the
        # single-comparison prev-vs-last gate — one round of potential
        # noise-sensitivity, bounded to newly-added headline queries
        young = {n for n in last["queries"] if n not in base["queries"]}
        bad.update(
            {
                n: msg
                for n, msg in _regressions(mid["queries"], last["queries"]).items()
                if n in young
            }
        )
    assert not bad, (
        "per-query wall-time regressions confirmed across the two most "
        f"recent driver rounds (own-time, >{GROWTH}x share and "
        f">{SLACK_SEC}s): " + "; ".join(bad.values())
    )


def test_local_bench_detail_not_regressed_vs_last_round():
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    detail_p = root / "BENCH_DETAIL.json"
    rounds = _bench_rounds()
    if not detail_p.exists() or not rounds:
        return
    detail = json.loads(detail_p.read_text())
    if not detail.get("queries"):
        return
    _, last_p, last = rounds[-1]
    if detail_p.stat().st_mtime <= last_p.stat().st_mtime:
        return  # detail predates the recorded round; nothing new to gate
    bad = _regressions(last["queries"], detail["queries"])
    assert not bad, (
        "this session's bench regressed vs the last recorded round "
        f"(own-time, >{GROWTH}x and >{SLACK_SEC}s): " + "; ".join(bad.values())
    )
