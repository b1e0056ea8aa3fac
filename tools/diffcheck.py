"""Local differential harness: runs every queries() entry on Spark and its
oracle_sql() twin on DuckDB, compares row count + column names + an
order-insensitive value hash (the driver's contract, re-implemented here so
mismatches are caught before a round ends).

Usage: python tools/diffcheck.py [--json out.json] [--lenient] [sf_dir] [query ...]

STRICT BY DEFAULT (round-3 hardening — the round-2 verdict proved the old
lenient canon masked exactly the two failure classes the driver caught):

1. Full-precision floats via ``repr()`` — no 6-sig-fig collapse, no
   int-folding, so a DuckDB HUGEINT that pandas renders ``201.0`` can never
   hash-equal Spark's BIGINT ``201``.
2. Signbit-aware zero — ``-0.0`` and ``0.0`` canonicalize differently.
3. Result-type audit: DuckDB ``DESCRIBE`` types vs Spark dtypes are mapped
   into portable families and compared per column; any oracle column whose
   DuckDB type is HUGEINT (int128 — the driver-canon divergence class) or
   whose family differs from Spark's is a failure even when values match.
4. Negative-zero sweep: any float cell with the IEEE sign bit set on a zero,
   in either engine, is reported.
5. Vanilla SparkSession — the driver does not apply the repo's tuned confs
   (UTC session timezone etc.), so neither does this harness.  Queries must
   answer correctly conf-independently.

``--lenient`` restores the old canon for triage only; the committed
CORRECTNESS_LOCAL.json must come from a strict run.

With --json, writes a CORRECTNESS-shaped report covering EVERY registered
query (the driver's own per-round check samples 50 registrations, so the
committed self-check is the complete record).
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import connect_views  # noqa: E402

# --- type-family mapping -----------------------------------------------------
# DuckDB DESCRIBE type → portable family.  HUGEINT deliberately maps to its
# own family so it can never silently pass against Spark's bigint.
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "int128", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "BLOB": "bin", "INTERVAL": "interval", "UUID": "str",
}

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
    "binary": "bin", "void": "null",
}


def duck_family(t: str) -> str:
    t = t.strip().upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP") or t.startswith("LIST"):
        return "nested"
    return _DUCK_FAMILY.get(t, f"?duck:{t}")


def spark_family(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return _SPARK_FAMILY.get(t, f"?spark:{t}")


def is_neg_zero(v) -> bool:
    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0


def canon_cell_strict(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision, signbit-preserving ('-0.0' != '0.0')
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon_cell_lenient(v) -> str:
    import datetime

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


def table_hash(cols: list[str], rows: list[tuple], canon) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def vanilla_spark():
    """The session the driver uses: stock confs, no repo tuning beyond
    parallelism.  Queries must be correct without the repo session's
    timezone/ANSI settings."""
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("diffcheck-vanilla")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    strict = True
    if "--lenient" in argv:
        strict = False
        argv.remove("--lenient")
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    canon = canon_cell_strict if strict else canon_cell_lenient
    report: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    spark = vanilla_spark()
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
            stypes = dict(sdf.dtypes)
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
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            dtypes = {r[0]: r[1] for r in desc}
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
        types_ok = True
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            if strict:
                for c in scols:
                    fs, fd = spark_family(stypes[c]), duck_family(dtypes[c])
                    if fd == "int128":
                        types_ok = False
                        problems.append(
                            f"type {c}: oracle emits {dtypes[c]} (int128 — driver-canon hazard); CAST it"
                        )
                    elif fs != fd:
                        types_ok = False
                        problems.append(f"type {c}: spark={stypes[c]}({fs}) duck={dtypes[c]}({fd})")
                nz = [
                    (side, i)
                    for side, rows in (("spark", srows), ("duck", drows))
                    for i, r in enumerate(rows)
                    if any(is_neg_zero(v) for v in r)
                ]
                if nz:
                    types_ok = False
                    problems.append(f"negative-zero cells: {nz[:3]}{'…' if len(nz) > 3 else ''}")
            hs, hd = table_hash(scols, srows, canon), table_hash(dcols, drows, canon)
            hash_ok = hs == hd
            if not hash_ok:
                problems.append(f"hash spark={hs} duck={hd}")
                # show first differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                set_d = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
                for a, b in zip(set_s, set_d):
                    if a != b:
                        problems.append(f"  first diff:\n    spark: {a}\n    duck:  {b}")
                        break
        rows_ok = len(srows) == len(drows)
        schema_ok = sorted(scols) == sorted(dcols)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": hash_ok and types_ok,
                        "spark_rows": len(srows), "oracle_rows": len(drows), "err": None}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=2) + "\n")
    ran = len([n for n in qs if not only or n in only])
    print(f"\n{ran - len(failures)}/{ran} passed" + (" [STRICT]" if strict else " [lenient]"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
