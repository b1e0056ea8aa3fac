"""Small-files micro-study for the batch-layout index store: probe cost and
file counts against a fragmented (one partition per micro-batch) vs
compacted index, plus the compaction cost itself.

Protocol (mirrors SCALING.md's persisted-LSH probe study): index the 50k
/tmp/scale_sf1 documents as N_BATCHES ingest batches via lsh_write_batch,
probe a fixed 500-document increment (lsh_probe_verified, min-of-3 wall),
compact with operators/batchstore.compact, re-probe.  The claim under
test: probe results are bit-identical across the fold, and the fragmented
index's per-file scheduling overhead — the cost that grows linearly with
ingest duration at a fixed trigger interval — is removed by one bounded
maintenance job.

Usage: python tools/batchstore_study.py [n_batches] [src_dir]
Writes BATCHSTORE_STUDY.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.operators import batchstore, lshindex
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("batchstore-study")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 100 != 0).localCheckpoint(eager=True)
    inc = docs.where(F.col("doc_id") % 100 == 0).limit(500).localCheckpoint(eager=True)

    path = tempfile.mkdtemp(prefix="batchstore_study_")
    t0 = time.monotonic()
    for b in range(n_batches):
        lshindex.lsh_write_batch(
            corpus.where(F.col("doc_id") % n_batches == b), path, batch_id=b
        )
    build_s = time.monotonic() - t0

    def files() -> int:
        from oltp_to_data_warehouse_pipeline_spark import fs

        return sum(
            1
            for line in fs.data_file_inventory(spark, path).splitlines()
            if line.rpartition(":")[0].endswith(".parquet")
        )

    def probe() -> tuple[float, int]:
        best, rows = float("inf"), -1
        for _ in range(3):
            t = time.monotonic()
            rows = lshindex.lsh_probe_verified(
                inc, path, corpus, threshold=0.2, before_batch_id=n_batches
            ).count()
            best = min(best, time.monotonic() - t)
        return round(best, 3), rows

    frag_files = files()
    frag_probe, frag_rows = probe()

    t0 = time.monotonic()
    stats = batchstore.compact(spark, path, upto_batch_id=n_batches, id_col="doc")
    compact_s = round(time.monotonic() - t0, 3)

    comp_files = files()
    comp_probe, comp_rows = probe()

    out = {
        "n_batches": n_batches,
        "src": src,
        "index_docs": corpus.count(),
        "build_s": round(build_s, 1),
        "fragmented": {"files": frag_files, "probe_s": frag_probe, "rows": frag_rows},
        "compact": {"wall_s": compact_s, **stats},
        "compacted": {"files": comp_files, "probe_s": comp_probe, "rows": comp_rows},
        "probe_rows_identical": frag_rows == comp_rows,
    }
    Path("BATCHSTORE_STUDY.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
