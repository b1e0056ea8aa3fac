"""Hadoop-FileSystem path utilities (fs.py) — the scheme-portable
replacement for driver-local os.path checks (round-2 advisor finding).

These run against file:// via the same JVM FileSystem code paths that serve
s3a://hdfs:// on a real cluster, so what they verify is the API contract
(hidden-name semantics, marker round-trips, inventory fingerprints), not
local-FS behavior per se.
"""

from __future__ import annotations

import os

from oltp_to_data_warehouse_pipeline_spark import fs


def test_hidden_name_convention():
    # metadata entries are hidden ...
    assert fs.is_hidden_name("_SUCCESS")
    assert fs.is_hidden_name("_applied_batches")
    assert fs.is_hidden_name(".part-0.crc")
    # ... but partition directories are DATA even when the partition column
    # starts with an underscore (the upsert store's __bucket=N layout) —
    # same exception Spark's own file index makes
    assert not fs.is_hidden_name("__bucket=0")
    assert not fs.is_hidden_name("part-00000.parquet")


def test_exists_and_has_data_files(spark, tmp_path):
    p = str(tmp_path / "tbl")
    assert not fs.exists(spark, p)
    assert not fs.has_data_files(spark, p)
    os.makedirs(p)
    assert fs.exists(spark, p)
    # markers alone are not data
    open(os.path.join(p, "_SUCCESS"), "w").close()
    assert not fs.has_data_files(spark, p)
    # a partition dir IS data
    os.makedirs(os.path.join(p, "__bucket=3"))
    assert fs.has_data_files(spark, p)


def test_text_roundtrip_and_touch(spark, tmp_path):
    p = str(tmp_path / "nested" / "marker.txt")
    fs.write_text(spark, p, "merge\ninv-line")
    assert fs.read_text(spark, p) == "merge\ninv-line"
    fs.write_text(spark, p, "overwritten")  # overwrite-safe
    assert fs.read_text(spark, p) == "overwritten"
    t = str(tmp_path / "touched")
    fs.touch(spark, t)
    assert fs.exists(spark, t)
    fs.delete(spark, t, recursive=False)
    assert not fs.exists(spark, t)


def test_inventory_ignores_markers_and_tracks_data(spark, tmp_path):
    p = str(tmp_path / "tbl")
    os.makedirs(os.path.join(p, "__bucket=0"))
    os.makedirs(os.path.join(p, "_applied_batches"))
    with open(os.path.join(p, "__bucket=0", "part-0.parquet"), "w") as f:
        f.write("xxxx")
    open(os.path.join(p, "_applied_batches", "b1"), "w").close()
    open(os.path.join(p, "_SUCCESS"), "w").close()
    inv = fs.data_file_inventory(spark, p)
    assert inv == "__bucket=0/part-0.parquet:4"
    # adding a marker does NOT change the fingerprint; adding data does
    open(os.path.join(p, "_applied_batches", "b2"), "w").close()
    assert fs.data_file_inventory(spark, p) == inv
    with open(os.path.join(p, "__bucket=0", "part-1.parquet"), "w") as f:
        f.write("yy")
    assert fs.data_file_inventory(spark, p) != inv


def test_join_is_uri_safe():
    assert fs.join("s3a://bucket/tbl/", "_batches", "b1") == "s3a://bucket/tbl/_batches/b1"
    assert fs.join("/local/tbl", "x") == "/local/tbl/x"
