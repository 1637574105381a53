#!/usr/bin/env python
"""Performance harness: batched 2Q process-tomography MLE on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The north-star target (BASELINE.json) is >= 10^4 two-qubit MLE reconstructions
per second on one v5e chip; vs_baseline = value / 10^4.

The headline solver is the accelerated projected gradient (APG / FISTA with
function restart — same likelihood optimum as the reference's PGDB, reached in
~3x fewer iterations); the reference-faithful PGDB figure is reported alongside.

Timing methodology: data are pre-generated on device and the timed region is
the solver call plus a full host fetch of its (real) outputs — on the axon TPU
tunnel block_until_ready can return before execution completes, so np.asarray
is the only reliable synchronization. Quality is reported as the relative
Frobenius reconstruction error (shot-noise limited at these shot counts: the
converged float64 figure is ~0.102 at 2000 shots/setting).
"""
import json
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 passes; both the line searches and (empirically)
# XLA's eigh are faster AND more accurate at full f32 precision here
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, "/root/repo")

from forest_benchmarking_tpu.benchmarks import (
    process_tomo_A_matrix, synth_process_datasets, split_complex, join_complex)
from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched

N_QUBITS = 2
DIM = 2 ** N_QUBITS
BATCH = 4096
SHOTS = 2000
TARGET_SOLVES_PER_SEC = 1.0e4


def _make_data(a_dev, key):
    @jax.jit
    def gen(a_ri, key):
        a = join_complex(a_ri)
        n, chois = synth_process_datasets(key, a, DIM, BATCH, SHOTS,
                                          dtype=jnp.float32)
        return n, jnp.stack([jnp.real(chois), jnp.imag(chois)])

    n, chois_ri = gen(a_dev, key)
    # materialize on host and re-upload so the timed solve has concrete inputs
    return jnp.asarray(np.asarray(n)), jnp.asarray(np.asarray(chois_ri))


def _solver(method, maxiter, loop_dyk_iters=None):
    @jax.jit
    def solve(a_ri, n, chois_ri):
        a = join_complex(a_ri)
        chois = join_complex(chois_ri)
        est = pgdb_process_estimate_batched(
            a, n, dim=DIM, stop_tol=1e-6, maxiter=maxiter, dyk_tol=1e-4,
            dyk_iters=20, method=method, loop_dyk_iters=loop_dyk_iters)
        err = jnp.sqrt(jnp.sum(jnp.abs(est - chois) ** 2, axis=(1, 2)))
        return err / jnp.sqrt(jnp.sum(jnp.abs(chois) ** 2, axis=(1, 2)))
    return solve


def _time_solver(solve, a_dev, n, chois_ri, reps=4):
    err = np.asarray(solve(a_dev, n, chois_ri))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        err = np.asarray(solve(a_dev, n, chois_ri))
        times.append(time.perf_counter() - t0)
    return err, min(times)


def tpu_throughput() -> dict:
    a_dev = jnp.asarray(split_complex(
        process_tomo_A_matrix(N_QUBITS).astype(np.complex64)))
    n, chois_ri = _make_data(a_dev, jax.random.PRNGKey(0))

    # APG with inexact in-loop Dykstra (2 inner iterations) + one final
    # converged projection: same shot-noise-floor error, ~1.5x faster than
    # running the batch-max 3 inner iterations every descent step
    err_apg, dt_apg = _time_solver(_solver("apg", 25, loop_dyk_iters=2),
                                   a_dev, n, chois_ri)
    err_pgdb, dt_pgdb = _time_solver(_solver("pgdb", 60), a_dev, n, chois_ri)
    return {
        "solves_per_sec": BATCH / dt_apg,
        "pgdb_solves_per_sec": BATCH / dt_pgdb,
        "batch": BATCH,
        "sec_per_batch": dt_apg,
        "mean_rel_frob_err": float(err_apg.mean()),
        "mean_rel_frob_err_pgdb": float(err_pgdb.mean()),
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
apg = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4,
                                               stop_tol=0.0, maxiter=40,
                                               method="apg"))
conv = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4,
                                                stop_tol=1e-12, maxiter=3000,
                                                dyk_iters=200))
apg_dev = float(np.max(np.abs(apg - conv)))
print(json.dumps({"max_deviation_vs_oracle": float(dev),
                  "apg_vs_converged_pgdb": apg_dev}))
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
        "metric": "2q_process_tomography_mle_throughput",
        "value": round(perf["solves_per_sec"], 2),
        "unit": "solves/sec",
        "vs_baseline": round(perf["solves_per_sec"] / TARGET_SOLVES_PER_SEC, 4),
        "batch": perf["batch"],
        "pgdb_solves_per_sec": round(perf["pgdb_solves_per_sec"], 2),
        "mean_rel_frob_err_f32": round(perf["mean_rel_frob_err"], 5),
        "mean_rel_frob_err_pgdb_f32": round(perf["mean_rel_frob_err_pgdb"], 5),
        "max_deviation_vs_oracle_f64": parity.get("max_deviation_vs_oracle"),
        "apg_vs_converged_pgdb_f64": parity.get("apg_vs_converged_pgdb"),
    }
    if "parity_error" in parity:
        result["parity_error"] = parity["parity_error"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
