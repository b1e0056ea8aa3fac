"""Local differential harness: runs every queries() entry on Spark and its
oracle_sql() twin on DuckDB, compares row count + column names + an
order-insensitive value hash (the driver's contract, re-implemented here so
mismatches are caught before a round ends).

Usage: python tools/diffcheck.py [--json out.json] [sf_dir] [query ...]

With --json, writes a CORRECTNESS-shaped report covering EVERY registered
query (the driver's own per-round check samples the first 50 registrations,
so the committed self-check is the complete record).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import connect_views  # noqa: E402


def canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("diffcheck")
    con = connect_views(sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": None, "oracle_rows": None, "err": f"spark: {e}"}
            continue
        if name not in oracles:
            ok = bool(srows)
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            if not ok:
                failures.append(name)
            report[name] = {"rows_match": ok, "schema_match": None, "hash_match": None,
                            "spark_rows": len(srows), "oracle_rows": None,
                            "err": None if ok else "no rows (rows-only check)"}
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": len(srows), "oracle_rows": None, "err": f"duckdb: {e}"}
            continue
        problems = []
        hash_ok = False
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            hash_ok = hs == hd
            if not hash_ok:
                problems.append(f"hash spark={hs} duck={hd}")
                # show first differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = sorted("|".join(canon_cell(r[i]) for i in order_s) for r in srows)
                set_d = sorted("|".join(canon_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(set_s, set_d):
                    if a != b:
                        problems.append(f"  first diff:\n    spark: {a}\n    duck:  {b}")
                        break
        rows_ok = len(srows) == len(drows)
        schema_ok = sorted(scols) == sorted(dcols)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok, "hash_match": hash_ok,
                        "spark_rows": len(srows), "oracle_rows": len(drows), "err": None}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=2) + "\n")
    ran = len([n for n in qs if not only or n in only])
    print(f"\n{ran - len(failures)}/{ran} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
