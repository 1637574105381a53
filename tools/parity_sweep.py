#!/usr/bin/env python
"""f64 parity-margin sweep of the fused PARITY_TUNED_2Q schedule (CPU).

Re-derives, for each (seed, shots) dataset family, the tight-projection
converged reference optimum (stop_tol=1e-14, maxiter=3000, dyk_iters=500 —
the same gold contract as tests/test_lanes_apg.py) and reports the max f64
deviation of the fused parity schedule against it. This is the robustness
sweep behind the <1e-6 parity contract (docs/performance.md, rounds 3-5);
run it after any PARITY_TUNED_2Q tuning change.

Usage:
    python tools/parity_sweep.py [out.json] [--shots 750,1000,...]
                                 [--seeds 8] [--batch 4]

Single-core CPU: ~1 minute per dataset family (gold dominates); the default
8 seeds x 6 shot counts is a ~45 min run. Writes one JSON line per dataset
plus a summary with the worst case.
"""
import argparse
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from forest_benchmarking_tpu.benchmarks import (  # noqa: E402
    process_tomo_A_matrix, synth_process_datasets)
from forest_benchmarking_tpu.ops.lanes_apg import (  # noqa: E402
    apg_fused, PARITY_TUNED_2Q)
from forest_benchmarking_tpu.tomography import (  # noqa: E402
    pgdb_process_estimate_batched)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="parity_sweep.json")
    ap.add_argument("--shots", default="750,1000,1500,2000,4000,8000")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    shot_counts = [int(s) for s in args.shots.split(",")]

    a = process_tomo_A_matrix(2)
    aj = jnp.asarray(a)
    rows = []
    worst = (0.0, None)
    for seed in range(args.seeds):
        for shots in shot_counts:
            key = jax.random.PRNGKey(seed * 100_003 + shots)
            n, _ = synth_process_datasets(key, aj, 4, args.batch, shots,
                                          dtype=jnp.float64)
            t0 = time.time()
            gold = np.asarray(pgdb_process_estimate_batched(
                aj, n, dim=4, stop_tol=1e-14, maxiter=3000, dyk_tol=1e-10,
                dyk_iters=500))
            est = np.asarray(apg_fused(aj, n, dim=4, use_pallas=False,
                                       **PARITY_TUNED_2Q))
            dev = float(np.max(np.abs(est - gold)))
            row = {"seed": seed, "shots": shots, "dev": dev,
                   "gold_secs": round(time.time() - t0, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
            if dev > worst[0]:
                worst = (dev, row)
    summary = {"schedule": {k: (list(map(list, v)) if k == "phases" else v)
                            for k, v in PARITY_TUNED_2Q.items()},
               "n_datasets": len(rows), "worst_dev": worst[0],
               "worst_row": worst[1]}
    print(json.dumps(summary), flush=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
