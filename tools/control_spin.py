"""Pure-CPU spin control (BENCH.md): the host/hypervisor ceiling for
8->32-way scaling of ANY workload — zero memory traffic, zero IPC,
perfectly balanced (task count an exact multiple of both pool sizes,
so no wave-tail), taskset-pinned like the Spark legs.

Measured on this sandbox: ~0.73-0.75 efficiency with ~3% hypervisor
steal — i.e. the >=0.8 N->4N criterion is unattainable here even for
an empty loop; every workload's ceiling is at or below this number.

Usage: python tools/control_spin.py [rounds=2]
Writes CONTROL_SPIN.json.
"""

from __future__ import annotations

import datetime
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SPIN = """
import multiprocessing as mp, time, sys
def spin(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x
P = int(sys.argv[1]); N = 128  # exact multiple of 8 and 32: no tail
t0 = time.perf_counter()
with mp.Pool(P) as p:
    p.map(spin, [2_500_000] * N, chunksize=N // P)
print(time.perf_counter() - t0)
"""


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    res: dict[int, list[float]] = {8: [], 32: []}
    for i in range(rounds):
        for procs in (8, 32):
            out = subprocess.run(
                [
                    "taskset", "-c", f"0-{procs - 1}",
                    sys.executable, "-c", _SPIN, str(procs),
                ],
                capture_output=True, text=True, timeout=600,
            )
            sec = float(out.stdout.strip())
            res[procs].append(sec)
            print(f"round {i} procs={procs}: {sec:.3f}s", file=sys.stderr)
    per_round = [
        round(res[8][i] / (4 * res[32][i]), 3) for i in range(rounds)
    ]
    record = {
        "protocol": (
            "pure-CPU spin, taskset-pinned 0..N-1, 128 tasks (exact "
            f"multiple of both pool sizes -> no wave-tail), x{rounds}"
        ),
        "date": datetime.date.today().isoformat(),
        "all_rounds": {"8": res[8], "32": res[32]},
        "per_round_efficiency": per_round,
        "ceiling_efficiency": sorted(per_round)[len(per_round) // 2],
        "meaning": (
            "host/hypervisor ceiling for 8->32-way scaling of ANY "
            "workload (zero memory traffic, zero IPC, no tail)"
        ),
    }
    (REPO / "CONTROL_SPIN.json").write_text(
        json.dumps(record, indent=2) + "\n"
    )
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
