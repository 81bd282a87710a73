"""Spark-free memory-bandwidth ceiling probe.

Quantifies THIS BOX's aggregate memory bandwidth at 1 / 4 / 16
taskset-pinned single-core processes, each summing its own 256 MB
float64 array (pure streaming reads, no cache reuse, no Python loop in
the hot path). If aggregate GB/s stops growing linearly between 4 and
16 processes, that ratio is a HARDWARE ceiling every engine on this
node shares — Spark, numpy, or the reference's native code — and it
bounds any 4x-core scaling measurement taken on one box, independent
of the engine under test.

Prints one JSON line and appends to BENCH/BASELINE.md.

Usage: python scripts/membw_probe.py [--mb 256] [--passes 8]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from proc_barrier import release as _release  # noqa: E402

_WORKER = r"""
import sys, time, numpy as np
mb, passes, barrier_dir, wid = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
import os
a = np.random.default_rng(0).random(mb * 1024 * 1024 // 8)  # float64
a.sum()  # touch all pages
open(os.path.join(barrier_dir, "ready-" + wid), "w").write("ok")
_deadline = time.time() + 900
while not os.path.exists(os.path.join(barrier_dir, "go")):
    if time.time() > _deadline:
        sys.exit(3)  # barrier never released -- die instead of orphaning
    time.sleep(0.02)
t0 = time.time()
s = 0.0
for _ in range(passes):
    s += a.sum()
dt = time.time() - t0
print("WORKER %.6f %.1f" % (dt, s), flush=True)
"""


def run_level(n_procs: int, mb: int, passes: int) -> float:
    """Aggregate GB/s with n pinned single-core processes."""
    import shutil
    import tempfile
    import time

    bdir = tempfile.mkdtemp(prefix="membw-")
    procs = []
    for i in range(n_procs):
        cmd = ["taskset", "-c", str(i), sys.executable, "-c", _WORKER,
               str(mb), str(passes), bdir, str(i)]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.DEVNULL, text=True))
    _release(bdir, n_procs, procs, timeout_s=120.0,
             ids=[str(i) for i in range(n_procs)])
    secs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out
        secs.append(float(out.split()[1]))
    shutil.rmtree(bdir, ignore_errors=True)
    total_bytes = n_procs * passes * mb * 1024 * 1024
    return total_bytes / max(secs) / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--passes", type=int, default=8)
    args = ap.parse_args()

    gbs = {n: round(run_level(n, args.mb, args.passes), 2) for n in (1, 4, 16)}
    eff_4_16 = round((gbs[16] / gbs[4]) / 4.0, 3)
    res = {
        "metric": "memory-bandwidth ceiling (pinned single-core numpy sum)",
        "aggregate_gb_per_s": gbs,
        "efficiency_4_to_16_procs": eff_4_16,
    }
    print(json.dumps(res))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} memory-bandwidth probe (Spark-free, pinned numpy "
            f"streaming sums, barrier-synced): aggregate GB/s at 1/4/16 "
            f"procs = {gbs[1]} / {gbs[4]} / {gbs[16]} -> 4->16-proc "
            f"efficiency **{eff_4_16}** — the hardware ceiling ANY engine "
            f"on this node shares.\n"
        )


if __name__ == "__main__":
    main()
