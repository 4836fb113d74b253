"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy sanctioned by
the driver: identical job + identical input at local[8] vs local[32]).

Runs ``bench.py --leg <cores> <replicate>`` in a fresh subprocess per
parallelism level (clean JVM each), computes

    efficiency = throughput_32 / (4 * throughput_8)

and writes BENCH_SCALING.json + the scaling section of BENCH.md.

Usage: python tools/bench_scaling.py [replicate=40]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_leg(cores: int, replicate: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--leg", str(cores), str(replicate)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=3600,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        raise SystemExit(f"leg cores={cores} failed rc={proc.returncode}")
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    legs = {}
    for cores in (8, 32):
        legs[cores] = run_leg(cores, replicate)
        print(f"local[{cores}]: {legs[cores]}", file=sys.stderr)

    eff = legs[32]["docs_per_sec"] / (4 * legs[8]["docs_per_sec"])
    record = {
        "protocol": "same job + same input, local[8] vs local[32] (driver-sanctioned N->4N proxy)",
        "date": datetime.date.today().isoformat(),
        "input_docs": legs[8]["docs"],
        "triples": legs[8]["triples"],
        "local8": legs[8],
        "local32": legs[32],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    (REPO / "BENCH_SCALING.json").write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
