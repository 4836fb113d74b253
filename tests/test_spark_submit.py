"""The north-rule launch contract, exercised literally: the packaged
engine runs via ``spark-submit --py-files dist/engine.zip`` at TWO
cluster sizes and emits the identical triple set at both — the
same-job-two-parallelism-levels determinism the scaling benchmark
relies on (the sandbox proxy for N vs 4N executors).

Uses the pyspark package's own spark-submit so the launcher version
always matches the library under test.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _submit(master: str, out: str) -> None:
    env = dict(os.environ)
    env["SPARK_DRIVER_MEM"] = "6g"  # two JVMs may coexist with the suite's
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    cmd = [
        str(SPARK_SUBMIT),
        "--master", master,
        "--py-files", str(REPO / "dist" / "engine.zip"),
        str(REPO / "jobs" / "annotate.py"),
        "--pages", f"world:{SF}",
        "--stores", f"world:{SF}",
        "--out", out,
    ]
    r = subprocess.run(
        cmd, cwd=str(REPO), env=env,
        capture_output=True, text=True, timeout=570,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]


def test_spark_submit_two_sizes_identical_triples(spark, tmp_path):
    # package exactly what's on disk (keeps the zip honest after edits)
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_dist.py")],
        check=True, cwd=str(REPO),
    )
    out_small = str(tmp_path / "n1")
    out_large = str(tmp_path / "n4")
    _submit("local[2]", out_small)
    _submit("local[8]", out_large)

    a = spark.read.parquet(f"{out_small}/triples")
    b = spark.read.parquet(f"{out_large}/triples")
    assert a.schema.simpleString() == b.schema.simpleString()
    n = a.count()
    assert n > 0
    assert b.count() == n
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
