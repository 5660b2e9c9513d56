"""Steal-gated scaling sampler: the data-collection half of the
round-4 scaling methodology (compose_scaling_r04b.py is the analysis
half).

Each sample is ONE fresh bench.py process at a given CPU level,
bracketed by a single-threaded numpy CPU probe (quiet ~0.76-0.8 s on
this VM; the composer gates at 1.7 s). Samples are appended as JSONL
so campaigns from different host regimes can be pooled and paired
per-pass by the composer.

Usage: python scripts/sample_scaling_gated.py [out.jsonl]
Env:   GRAFT_SCALING_PASSES (default 4)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_gated.jsonl"
PASSES = int(os.environ.get("GRAFT_SCALING_PASSES", "4"))


def probe() -> float:
    a = np.random.RandomState(0).rand(2_000_000)
    t = time.time()
    for _ in range(30):
        np.sort(a)
    return round(time.time() - t, 3)


def run(mode: str, ncpu: int):
    # mirrors bench.run_scaling()'s subprocess env exactly
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               GRAFT_BENCH_ITERATIONS="1")
    if mode == "--headline-only":
        env.setdefault("GRAFT_BENCH_REPLICATE", "128")
    out = subprocess.run([sys.executable, "bench.py", mode], env=env,
                         capture_output=True, text=True, check=True).stdout
    r = json.loads(out.strip().splitlines()[-1])
    return r["headline_sec"], r["turns_per_sec"]


def main():
    with open(OUT, "a") as f:
        for i in range(PASSES):
            # lo immediately followed by hi: the composer pairs each lo
            # with the NEXT hi of the same mode (same host regime)
            for mode in ("--stateful-headline", "--headline-only"):
                for ncpu in (4, 16):
                    pb = probe()
                    sec, tps = run(mode, ncpu)
                    pa = probe()
                    rec = {"t": time.time(), "pass": i, "mode": mode,
                           "ncpu": ncpu, "sec": sec, "tps": tps,
                           "probe_before": pb, "probe_after": pa}
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(rec, file=sys.stderr)


if __name__ == "__main__":
    main()
