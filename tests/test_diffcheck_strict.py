"""The local differential harness must reproduce DRIVER strictness.

Round-2 postmortem: the lenient canon (6-sig-fig floats, int-collapse,
signbit-blind zero) reported 149/149 while the driver reported 46/50 — the
two failure classes it masked (DuckDB HUGEINT stringification, -0.0 after
round()) are exactly what these tests pin.  tools/diffcheck.py is strict by
default now; each assertion here fails if someone re-lenifies it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from diffcheck import (  # noqa: E402
    canon_cell_strict,
    duck_family,
    is_neg_zero,
    spark_family,
    table_hash,
)


def test_strict_canon_distinguishes_int_from_float_rendering():
    # DuckDB HUGEINT surfaces via pandas as float64 -> "201.0"; Spark BIGINT
    # stays int -> "201".  The old canon collapsed both to "201".
    assert canon_cell_strict(201) != canon_cell_strict(201.0)
    assert canon_cell_strict(201) == "201"
    assert canon_cell_strict(201.0) == "201.0"


def test_strict_canon_is_signbit_aware():
    assert canon_cell_strict(-0.0) != canon_cell_strict(0.0)
    assert is_neg_zero(-0.0) and not is_neg_zero(0.0)
    assert not is_neg_zero(0)  # int zero has no sign bit


def test_strict_canon_keeps_full_float_precision():
    a, b = 0.1234567891, 0.1234567892  # differ past 6 sig figs
    assert canon_cell_strict(a) != canon_cell_strict(b)


def test_type_families_flag_hugeint_and_match_sanely():
    assert duck_family("HUGEINT") == "int128"          # never matches Spark
    assert duck_family("BIGINT") == spark_family("bigint") == "int"
    assert duck_family("DOUBLE") == spark_family("double") == "float"
    assert duck_family("DECIMAL(38,0)") == spark_family("decimal(38,0)") == "decimal"
    assert duck_family("VARCHAR") == spark_family("string") == "str"
    assert duck_family("TIMESTAMP") == spark_family("timestamp_ntz") == "ts"


def test_table_hash_catches_the_round2_failures():
    cols = ["k", "v"]
    spark_rows = [("a", 201)]
    duck_hugeint_rows = [("a", 201.0)]
    h = lambda rows: table_hash(cols, rows, canon_cell_strict)  # noqa: E731
    assert h(spark_rows) != h(duck_hugeint_rows)
    assert h([("a", 0.0)]) != h([("a", -0.0)])
