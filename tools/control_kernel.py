"""No-Spark hardware-ceiling control for the N->4N scaling evidence
(BENCH.md): the IDENTICAL per-document annotation kernel
(plans.annotate_fused._annotate_doc + the real broadcast model), run
under plain ``multiprocessing`` with the SAME taskset topology as the
Spark legs (parent pinned to cpus 0..N-1; workers inherit affinity).

Whatever efficiency THIS measures is the host's ceiling for 8->32-way
parallel execution of the annotation kernel — no JVM, no shuffle, no
scheduler, no Arrow boundary. The Spark legs (tools/bench_scaling.py)
are judged against it: Spark overhead is only the part of the gap the
control does NOT explain.

Prep (Spark, untimed): build the sf0.1 world model once, pickle it,
and write the replicated html pages to parquet. Legs (no Spark): one
pinned subprocess per level; each pool worker unpickles the model
once and streams its parquet files through _annotate_doc.

Usage: python tools/control_kernel.py [replicate=240] [rounds=2]
Writes CONTROL_KERNEL.json.
"""

from __future__ import annotations

import datetime
import json
import os
import pickle
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# worker mode: python control_kernel.py --worker <model.pkl> <file> [...]
# ---------------------------------------------------------------------------
def _worker(model_path: str, files: list[str]) -> int:
    import pyarrow.parquet as pq

    from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig
    from dbpedia_spotlight_db_spark.plans.annotate_fused import _annotate_doc

    with open(model_path, "rb") as f:
        model = pickle.load(f)
    cfg = AnnotateConfig()
    n = 0
    cols: list = [[], [], [], [], [], [], []]
    for fp in files:
        tbl = pq.read_table(fp, columns=["url", "html"])
        for url, html in zip(
            tbl.column("url").to_pylist(), tbl.column("html").to_pylist()
        ):
            _annotate_doc(
                url, html, model, cfg.spotter_threshold, cfg.confidence,
                cfg.top_m_prior, cfg.w_prior, cfg.w_ctx, cols,
            )
            n += 1
        # keep buffers bounded like the Arrow batch boundary does
        for c in cols:
            c.clear()
    return n


def _leg_main(model_path: str, pages_dir: str, procs: int) -> None:
    """Runs inside the taskset-pinned subprocess: a pool of ``procs``
    workers over the parquet files, emits one JSON line."""
    import multiprocessing as mp
    import time

    files = sorted(str(p) for p in Path(pages_dir).glob("*.parquet"))
    chunks: list[list[str]] = [[] for _ in range(procs * 4)]
    for i, fp in enumerate(files):
        chunks[i % len(chunks)].append(fp)
    chunks = [c for c in chunks if c]
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        counts = pool.starmap(
            _worker, [(model_path, c) for c in chunks]
        )
    sec = time.perf_counter() - t0
    print(json.dumps({
        "procs": procs,
        "docs": sum(counts),
        "sec": round(sec, 3),
        "docs_per_sec": round(sum(counts) / sec, 2),
    }))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--leg":
        _leg_main(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # ---- prep (Spark, untimed): model pickle + replicated pages ----
    from dbpedia_spotlight_db_spark.entrypoint import (
        documents_as_pages,
        replicate_docs,
        world_stores,
    )
    from dbpedia_spotlight_db_spark.plans.annotate_fused import build_model
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scratch = tempfile.mkdtemp(prefix="control_kernel_", dir="/dev/shm")
    spark = get_spark("control-prep", cores=32, shuffle_partitions=64)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stores = world_stores(spark, docs)
    model = build_model(stores)
    model_path = os.path.join(scratch, "model.pkl")
    with open(model_path, "wb") as f:
        pickle.dump(model, f)
    pages_dir = os.path.join(scratch, "pages")
    documents_as_pages(
        replicate_docs(docs.repartition(128), replicate)
    ).write.mode("overwrite").parquet(pages_dir)
    spark.stop()

    # ---- pinned legs, interleaved like bench_scaling ----
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(rounds):
        for procs in (8, 32):
            proc = subprocess.run(
                [
                    "taskset", "-c", f"0-{procs - 1}",
                    sys.executable, __file__,
                    "--leg", model_path, pages_dir, str(procs),
                ],
                capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-3000:])
                raise SystemExit(f"control leg procs={procs} failed")
            leg = json.loads(proc.stdout.strip().splitlines()[-1])
            runs[procs].append(leg)
            print(
                f"round {i} procs={procs}: {leg['sec']}s "
                f"({leg['docs_per_sec']} docs/s)",
                file=sys.stderr,
            )

    per_round = [
        round(r8["sec"] / (4 * r32["sec"]), 3)
        for r8, r32 in zip(runs[8], runs[32])
    ]
    med = sorted(per_round)[len(per_round) // 2]
    record = {
        "protocol": (
            "no-Spark control: identical _annotate_doc kernel + real model, "
            "multiprocessing pool, taskset-pinned 0..N-1 (same topology as "
            f"the Spark legs), interleaved x{rounds}"
        ),
        "date": datetime.date.today().isoformat(),
        "docs": runs[8][0]["docs"],
        "all_rounds": {
            "8": [r["sec"] for r in runs[8]],
            "32": [r["sec"] for r in runs[32]],
        },
        "docs_per_sec": {
            "8": max(r["docs_per_sec"] for r in runs[8]),
            "32": max(r["docs_per_sec"] for r in runs[32]),
        },
        "per_round_efficiency": per_round,
        "ceiling_efficiency": med,
        "meaning": (
            "the host's own 8->32-way scaling ceiling for this kernel — "
            "memory bandwidth + SMT topology, before any Spark is involved"
        ),
    }
    (REPO / "CONTROL_KERNEL.json").write_text(
        json.dumps(record, indent=2) + "\n"
    )
    print(json.dumps(record, indent=2))
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
