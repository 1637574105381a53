#!/usr/bin/env python
"""Performance harness: batched 2Q process-tomography PGDB MLE on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The north-star target (BASELINE.json) is >= 10^4 two-qubit PGDB reconstructions
per second on one v5e chip; vs_baseline = value / 10^4.

TPU notes: complex dtypes never cross the host boundary (axon tunnel
limitation); the solve runs in float32/complex64 with a float-only jit surface.
A parity figure vs the float64 numpy oracle is computed in a cpu subprocess and
attached as an extra key.
"""
import json
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 passes; the PGDB cost/gradient needs full f32
# (otherwise the backtracking line search sees noise and stalls immediately)
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, "/root/repo")

from forest_benchmarking_tpu.benchmarks import (
    process_tomo_A_matrix, synth_process_datasets, split_complex, join_complex)
from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
from forest_benchmarking_tpu.ops.superoperator_transformations import (
    choi2pauli_liouville)
from forest_benchmarking_tpu.distance_measures import process_fidelity

N_QUBITS = 2
DIM = 2 ** N_QUBITS
BATCH = 1024
SHOTS = 2000
TARGET_SOLVES_PER_SEC = 1.0e4

# f32 solver settings: cost-decrease stop below f32 resolution never fires, so
# use a realistic tolerance; accuracy is shot-noise-limited at 2000 shots anyway
STOP_TOL = 1e-6
MAXITER = 60
DYK_TOL = 1e-4
DYK_ITERS = 60


def tpu_throughput() -> dict:
    a_host = split_complex(process_tomo_A_matrix(N_QUBITS).astype(np.complex64))

    @jax.jit
    def step(a_ri, key):
        a = join_complex(a_ri)
        n, true_chois = synth_process_datasets(key, a, DIM, BATCH, SHOTS,
                                               dtype=jnp.float32)
        est = pgdb_process_estimate_batched(
            a, n, dim=DIM, stop_tol=STOP_TOL, maxiter=MAXITER,
            dyk_tol=DYK_TOL, dyk_iters=DYK_ITERS)
        # relative Frobenius reconstruction error (shot-noise limited)
        err = jnp.sqrt(jnp.sum(jnp.abs(est - true_chois) ** 2, axis=(1, 2)))
        norm = jnp.sqrt(jnp.sum(jnp.abs(true_chois) ** 2, axis=(1, 2)))
        return err / norm

    a_dev = jnp.asarray(a_host)
    # warmup/compile
    err = step(a_dev, jax.random.PRNGKey(0))
    err.block_until_ready()

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        err = step(a_dev, jax.random.PRNGKey(i + 1))
        err.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    err_host = np.asarray(err)
    return {
        "solves_per_sec": BATCH / dt,
        "batch": BATCH,
        "sec_per_batch": dt,
        "mean_rel_frob_err": float(err_host.mean()),
        "max_rel_frob_err": float(err_host.max()),
    }


PARITY_SNIPPET = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, json
import jax.numpy as jnp
from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                synth_process_datasets)
from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
from oracles import np_pgdb

a = process_tomo_A_matrix(2)
n, _ = synth_process_datasets(jax.random.PRNGKey(7), jnp.asarray(a), 4, 4, 1000,
                              dtype=jnp.float64)
ours = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4))
dev = max(np.max(np.abs(ours[i] - np_pgdb(a, np.asarray(n[i]), 4)))
          for i in range(n.shape[0]))
print(json.dumps({"max_deviation_vs_oracle": float(dev)}))
"""


def cpu_parity() -> dict:
    try:
        out = subprocess.run([sys.executable, "-u", "-c", PARITY_SNIPPET],
                             capture_output=True, text=True, timeout=1800)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"max_deviation_vs_oracle": None,
                "parity_error": out.stderr[-300:]}
    except Exception as e:  # noqa: BLE001
        return {"max_deviation_vs_oracle": None, "parity_error": str(e)[:300]}


def main():
    perf = tpu_throughput()
    parity = cpu_parity()
    result = {
        "metric": "2q_process_tomography_pgdb_mle_throughput",
        "value": round(perf["solves_per_sec"], 2),
        "unit": "solves/sec",
        "vs_baseline": round(perf["solves_per_sec"] / TARGET_SOLVES_PER_SEC, 4),
        "batch": perf["batch"],
        "mean_rel_frob_err_f32": round(perf["mean_rel_frob_err"], 5),
        "max_rel_frob_err_f32": round(perf["max_rel_frob_err"], 5),
        "sec_per_batch": round(perf["sec_per_batch"], 5),
        "max_deviation_vs_oracle_f64": parity.get("max_deviation_vs_oracle"),
    }
    if "parity_error" in parity:
        result["parity_error"] = parity["parity_error"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
