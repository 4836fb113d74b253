"""jobs/compact.py: a fragmented table is rewritten into ~target-
sized bins in one pass, losslessly, with exactly one file per bin.
"""

from __future__ import annotations

import glob
import json

from jobs.compact import main as compact_main, plan_bins


def test_plan_bins_arithmetic():
    files = [("a", 60), ("b", 60), ("c", 60), ("d", 10)]
    # target 100: offsets 0,60,120,180 -> bins 0,0,1,1
    assert plan_bins(files, 100) == {"a": 0, "b": 0, "c": 1, "d": 1}
    # one giant file still gets its own bin, never split
    assert plan_bins([("x", 1000)], 100) == {"x": 0}


def test_compact_job_conserves_rows_and_coalesces(spark, tmp_path):
    src = str(tmp_path / "frag")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(37).write.parquet(src)  # 37 tiny files
    n_frag = len(glob.glob(f"{src}/*.parquet"))
    assert n_frag >= 30

    out = str(tmp_path / "opt")
    total_bytes = sum(
        __import__("os").path.getsize(p)
        for p in glob.glob(f"{src}/*.parquet")
    )
    compact_main(
        ["--table", src, "--out", out, "--target-bytes",
         str(max(1, total_bytes // 4))]
    )

    man = json.load(open(f"{out}/compact.manifest.json"))
    assert man["rows"] == docs.count()
    assert man["files_out"] < n_frag / 3  # genuinely coalesced
    assert man["files_out"] == man["bins"]  # one file per bin

    back = spark.read.parquet(f"{out}/data").drop("bin")
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(*docs.columns).collect()}
    assert a == b
