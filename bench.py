#!/usr/bin/env python
"""Performance harness: batched 2Q process-tomography MLE on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The north-star target (BASELINE.json) is >= 10^4 two-qubit MLE reconstructions
per second on one v5e chip; vs_baseline = value / 10^4.

Two first-class figures are reported:
- ``value`` (headline): the fused lanes-layout Pallas solver
  (ops/lanes_apg.py) at its statistical-equivalence schedule
  (``HEADLINE_TUNED_2Q``): warm-started APG whose estimate sits on the same
  likelihood plateau as the converged reference optimum — the f64
  likelihood-ratio statistic 2*N*deltaLL measures < 4 worst-case over the
  500-8000 shots/setting envelope (1-sigma region for this 240-parameter
  model: ~240), TIGHTER than the early-exit XLA warm-APG path (worst 5.15
  on the same datasets) while ~2x its speed.
- ``parity_solves_per_sec``: the same fused solver at its strict-parity
  schedule (``PARITY_TUNED_2Q``), whose f64 output deviates < 1e-6 from the
  reference algorithm's converged optimum with tight projections
  (``fused_parity_dev_f64``) — strict parity AND above the 10^4 bar.

``headline_sustained_solves_per_sec`` additionally reports the
production-dispatch pattern (4 queued batch dispatches, one end-of-stream
synchronization): per-dispatch tunnel latency (~16-38 ms) overlaps with
execution, which is how a real acquisition pipeline would drive the chip.
The XLA warm-APG while_loop path (the round-1/2 headline), cold-start APG,
and reference-faithful PGDB figures are reported alongside.

Timing methodology: data are pre-generated on device and the timed region is
the solver call plus a full host fetch of its (real) outputs — on the axon TPU
tunnel block_until_ready can return before execution completes, so np.asarray
is the only reliable synchronization. Quality is reported as the relative
Frobenius reconstruction error (shot-noise limited at these shot counts: the
converged float64 figure is ~0.102 at 2000 shots/setting).

Transient-tolerance contract (round 4): the harness prints ONE JSON line and
exits 0 even when the tunnel throws transients. Every measurement stage runs
under bounded retries (``_retry``); a whole-measurement in-process failure
falls back to ONE fresh subprocess (a new process gets a new tunnel
connection); and ``main()`` emits whatever succeeded with an ``errors`` field
instead of dying. tests/test_bench_harness.py injects failures to verify.
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
from forest_benchmarking_tpu.ops.lanes_apg import (
    apg_fused, PARITY_TUNED_2Q, HEADLINE_TUNED_2Q)

N_QUBITS = 2
DIM = 2 ** N_QUBITS
BATCH = 16384          # headline knee; cold/PGDB time a 4096 slice (their optimum)
SHOTS = 2000
TARGET_SOLVES_PER_SEC = 1.0e4

# TPU v5e single-chip peaks for the roofline figures below (public spec:
# 197 TFLOP/s bf16 MXU; f32 "highest" matmuls run 6-pass bf16 so the f32
# MXU ceiling is ~1/6 of that; the VPU does 8x128x4 f32 FLOPs/cycle at
# ~1.7 GHz ~ 7 TFLOP/s). The fused solver is VPU-dominated, the headline
# solver eigh/VPU-dominated, so fraction-of-VPU-peak is the honest roofline.
V5E_BF16_MXU_TFLOPS = 197.0
V5E_F32_VPU_TFLOPS = 7.0


def _retry(label: str, fn, errors: dict, attempts: int = 3,
           backoff_sec: float = 5.0):
    """Run ``fn()`` with bounded retries; record transient failures.

    The axon tunnel throws transient ``FailedPrecondition``/RPC errors on
    host fetches and remote (Mosaic) compiles; any stage can hit one. On
    success after a retry, the transient is recorded in ``errors`` (so the
    receipt shows it happened) but the figure is still measured. Raises the
    last exception only after ``attempts`` failures.
    """
    last = None
    for i in range(attempts):
        try:
            out = fn()
            if i > 0:
                errors[f"{label}_recovered"] = (
                    f"succeeded on attempt {i + 1} after: {str(last)[:160]}")
            return out
        except Exception as e:  # noqa: BLE001 — tunnel transients are broad
            last = e
            if i < attempts - 1:
                time.sleep(backoff_sec * (i + 1))
    errors[label] = f"{attempts} attempts failed; last: {str(last)[:200]}"
    raise last


def fused_apg_flops_per_solve(phases, init_iters=8, init_sweeps=3,
                              final_iters=20, final_sweeps=1,
                              dim=DIM, a_rows=None) -> float:
    """Analytic FLOPs of one fused-APG solve (ops/lanes_apg.py).

    Counted per problem (the kernel is elementwise across lanes):
    - each Dykstra iteration: hermitianize (2n^2) + basis rotation
      M = V^dag H V (two complex n x n matmuls, 8n^3 each) + s Jacobi sweeps
      (n-1 rounds of rotations on A columns+rows and V columns, ~36n^2 per
      round) + eigen-reconstruction (8n^3) + TP projection (~4n^2);
    - each outer iteration: p = Re(A x) and the gradient A^T eta (two
      R x n^2 real mat-vecs, 2 R n^2 each), the cost reduction (~2R), and
      momentum/update elementwise terms (~10 n^2);
    with n = dim^2 and R the A-matrix row count.
    """
    n = dim * dim
    if a_rows is None:
        a_rows = 1080  # 2Q process-tomography A-matrix rows
    per_sweep = 36.0 * n * n * (n - 1)
    per_dyk = lambda s: 2 * n * n + 16.0 * n ** 3 + s * per_sweep \
        + 8.0 * n ** 3 + 4 * n * n
    per_outer = 2 * (2.0 * a_rows * n * n) + 2 * a_rows + 10 * n * n
    total = init_iters * per_dyk(init_sweeps) + final_iters * per_dyk(final_sweeps)
    for phase in phases:
        outer, ld, s = phase[:3]
        srest = phase[3] if len(phase) == 4 else s
        total += outer * (per_outer + per_dyk(s) + (ld - 1) * per_dyk(srest))
    return total


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


def _solver(method, maxiter, loop_dyk_iters=None, warm_start=False,
            stop_tol=1e-6, return_iters=False):
    @jax.jit
    def solve(a_ri, n, chois_ri):
        a = join_complex(a_ri)
        chois = join_complex(chois_ri)
        est = pgdb_process_estimate_batched(
            a, n, dim=DIM, stop_tol=stop_tol, maxiter=maxiter, dyk_tol=1e-4,
            dyk_iters=20, method=method, loop_dyk_iters=loop_dyk_iters,
            warm_start=warm_start, return_iters=return_iters)
        if return_iters:
            est, iters = est
        err = jnp.sqrt(jnp.sum(jnp.abs(est - chois) ** 2, axis=(1, 2)))
        err = err / jnp.sqrt(jnp.sum(jnp.abs(chois) ** 2, axis=(1, 2)))
        return (err, iters) if return_iters else err
    return solve


def headline_flops_per_solve(mean_iters: float, dim=DIM, a_rows=1080) -> float:
    """Estimated FLOPs of one warm-start APG solve (the headline config).

    Per outer iteration: the two R x n^2 gradient mat-vecs (4 R n^2), one
    Dykstra iteration whose 16x16 complex eigh we charge at ~30 n^3 (a
    tridiagonalization + QR-iteration estimate — the one imprecise term),
    reconstruction 8 n^3, and ~12 n^2 of elementwise updates. Plus ~6
    Dykstra iterations of fixed overhead (warm-start projection + the final
    converged projection). ``mean_iters`` is MEASURED per batch via
    ``return_iters=True``, not assumed.
    """
    n = dim * dim
    per_dyk = 30.0 * n ** 3 + 8.0 * n ** 3 + 6 * n * n
    per_outer = 4.0 * a_rows * n * n + per_dyk + 12 * n * n
    return mean_iters * per_outer + 6 * per_dyk


def _time_solver(solve, a_dev, n, chois_ri, reps=4):
    fetch = lambda out: jax.tree.map(np.asarray, out)  # full host fetch
    err = fetch(solve(a_dev, n, chois_ri))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        err = fetch(solve(a_dev, n, chois_ri))
        times.append(time.perf_counter() - t0)
    return err, min(times)


def _time_solver_sustained(solve, a_dev, n, chois_ri, k=4, reps=3):
    """Production dispatch pattern: queue ``k`` batch solves back-to-back,
    synchronize (full host fetch) at the end of the stream — per-dispatch
    tunnel latency overlaps with execution. The solver is assumed warm."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [solve(a_dev, n, chois_ri) for _ in range(k)]
        for o in outs:
            jax.tree.map(np.asarray, o)
        times.append(time.perf_counter() - t0)
    return min(times) / k


def tpu_throughput(errors: dict = None, comparisons: bool = True) -> dict:
    """Measure the config-2 figures on the live backend.

    ``comparisons=False`` measures only the two first-class figures (fused
    headline + fused parity) — used by bench_all.py for a self-contained
    config-2 row without re-timing the XLA/cold/PGDB comparison solvers.
    """
    errors = {} if errors is None else errors
    a_dev = _retry("upload_a_matrix", lambda: jnp.asarray(split_complex(
        process_tomo_A_matrix(N_QUBITS).astype(np.complex64))), errors)
    # the very first host fetch is where round 3's receipt died — retried now
    n, chois_ri = _retry(
        "make_data", lambda: _make_data(a_dev, jax.random.PRNGKey(0)), errors)

    # the A-matrix is fixed per experiment design: production solvers reuse
    # pinv(A), so it is precomputed (host, f64 for accuracy) and passed in
    pv_host = np.linalg.pinv(
        process_tomo_A_matrix(N_QUBITS).astype(np.complex128))
    pinv_ri = jnp.asarray(np.stack([pv_host.real, pv_host.imag])
                          .astype(np.float32))

    def make_fused(cfg):
        @jax.jit
        def solve_fused(a_ri, nn, chois_ri, pv_ri):
            a = join_complex(a_ri)
            chois = join_complex(chois_ri)
            est = apg_fused(a, nn, dim=DIM, a_pinv=join_complex(pv_ri),
                            **cfg)
            err = jnp.sqrt(jnp.sum(jnp.abs(est - chois) ** 2, axis=(1, 2)))
            return err / jnp.sqrt(jnp.sum(jnp.abs(chois) ** 2, axis=(1, 2)))
        return lambda a_ri, nn, c_ri: solve_fused(a_ri, nn, c_ri, pinv_ri)

    # The XLA warm-APG while_loop path (the round-1/2 headline): per-problem
    # early exit from the projected linear-inversion warm start. Measured
    # FIRST (it involves no Pallas/Mosaic compile) so it can stand in for the
    # headline if a transient remote-compile failure takes the fused kernel
    # down. Its per-problem iteration counts are MEASURED via an untimed
    # return_iters call (returning the extra (B,) array from the timed
    # program costs ~15% on the tunnel).
    err_apg = dt_apg = mean_iters = xla_flops = None
    if comparisons:
        try:
            err_apg, dt_apg = _retry("xla_warm_apg", lambda: _time_solver(
                _solver("apg", 25, loop_dyk_iters=1, warm_start=True,
                        stop_tol=1e-4), a_dev, n, chois_ri), errors)
            solve_iters = _solver("apg", 25, loop_dyk_iters=1,
                                  warm_start=True, stop_tol=1e-4,
                                  return_iters=True)
            _, iters = _retry("xla_warm_apg_iters", lambda: jax.tree.map(
                np.asarray, solve_iters(a_dev, n, chois_ri)), errors)
            mean_iters = float(np.asarray(iters).mean())
            xla_flops = headline_flops_per_solve(mean_iters)
        except Exception:  # noqa: BLE001 — comparison line; keep going
            err_apg = dt_apg = mean_iters = xla_flops = None

    # Headline config: the fused solver's statistical-equivalence schedule
    # (HEADLINE_TUNED_2Q — see its comment in ops/lanes_apg.py for the f64
    # LLR evidence: worst 3.66 over 16 datasets, vs 5.15 for the XLA
    # warm-APG path on the same data; the parity subprocess below re-measures
    # both statistics at the exact production settings). Falls back to the
    # XLA warm-APG figures if the Mosaic remote compile fails transiently.
    head_flops = fused_apg_flops_per_solve(**{
        k: v for k, v in HEADLINE_TUNED_2Q.items() if k != "mu"})
    try:
        solve_head = make_fused(HEADLINE_TUNED_2Q)
        err_head, dt_head = _retry("headline_fused", lambda: _time_solver(
            solve_head, a_dev, n, chois_ri), errors)
        dt_head_sustained = _retry(
            "headline_sustained", lambda: _time_solver_sustained(
                solve_head, a_dev, n, chois_ri), errors)
    except Exception as e:  # noqa: BLE001 — transient tunnel/Mosaic failure
        if dt_apg is not None:
            errors["headline_fallback"] = (
                f"fused headline failed ({str(e)[:200]}); reporting the XLA "
                f"warm-APG path")
            err_head, dt_head, dt_head_sustained = err_apg, dt_apg, dt_apg
            head_flops = xla_flops
        else:
            raise  # nothing to report at all: let the subprocess retry run
    head_gflops = head_flops * BATCH / dt_head / 1e9

    # parity config: the same fused solver at the strict-parity schedule.
    # Its f64 output matches the converged tight-projection reference optimum
    # to < 1e-6 (measured below in the parity subprocess as
    # fused_parity_dev_f64) while clearing the 10^4 solves/s bar on-chip.
    fused_flops = fused_apg_flops_per_solve(**{
        k: v for k, v in PARITY_TUNED_2Q.items() if k != "mu"})
    try:
        solve_par = make_fused(PARITY_TUNED_2Q)
        err_fused, dt_fused = _retry("parity_fused", lambda: _time_solver(
            solve_par, a_dev, n, chois_ri), errors)
    except Exception:  # noqa: BLE001 — recorded by _retry
        err_fused, dt_fused = err_apg, float("inf")
    fused_gflops = fused_flops * BATCH / dt_fused / 1e9
    # comparison solvers run their own optimal batch (4096): without the warm
    # start the vmapped while_loop tail grows with batch, so larger batches
    # make them slower per solve — timing them at 16384 would be unfair
    sub = 4096
    err_cold = err_pgdb = dt_cold = dt_pgdb = None
    if comparisons:
        n4, c4 = n[:sub], chois_ri[:, :sub]
        try:
            err_cold, dt_cold = _retry("apg_cold", lambda: _time_solver(
                _solver("apg", 25, loop_dyk_iters=2), a_dev, n4, c4), errors)
            err_pgdb, dt_pgdb = _retry("pgdb", lambda: _time_solver(
                _solver("pgdb", 60), a_dev, n4, c4), errors)
        except Exception:  # noqa: BLE001 — comparison lines only
            err_cold = err_pgdb = dt_cold = dt_pgdb = None

    def _per_sec(count, dt):
        return None if dt is None else count / dt

    def _mean(err):
        return None if err is None else float(np.asarray(err).mean())

    return {
        "solves_per_sec": BATCH / dt_head,
        "sustained_solves_per_sec": BATCH / dt_head_sustained,
        "headline_flops_per_solve": head_flops,
        "headline_achieved_gflops": head_gflops,
        "xla_warm_apg_solves_per_sec": _per_sec(BATCH, dt_apg),
        "xla_warm_apg_mean_iters": mean_iters,
        "xla_warm_apg_flops_per_solve": xla_flops,
        "parity_solves_per_sec": BATCH / dt_fused,
        "parity_flops_per_solve": fused_flops,
        "parity_achieved_gflops": fused_gflops,
        "parity_fraction_vpu_peak": fused_gflops / (V5E_F32_VPU_TFLOPS * 1e3),
        "mean_rel_frob_err_parity": _mean(err_fused),
        "apg_cold_solves_per_sec": _per_sec(sub, dt_cold),
        "pgdb_solves_per_sec": _per_sec(sub, dt_pgdb),
        "batch": BATCH,
        "sec_per_batch": dt_head,
        "mean_rel_frob_err": _mean(err_head),
        "mean_rel_frob_err_xla_warm": _mean(err_apg),
        "mean_rel_frob_err_cold": _mean(err_cold),
        "mean_rel_frob_err_pgdb": _mean(err_pgdb),
        "errors": errors,
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
# the XLA warm-APG config (warm start + inexact prox + stop_tol 1e-4) and
# the fused HEADLINE config, at their EXACT production settings: parameter
# deviation on the flat optimum plateau, plus the likelihood-ratio statistic
# 2*N*deltaLL in shot units (n is normalized by the grand total
# N = shots * n_setting_pairs, so the statistic rescales the normalized
# cross-entropy excess back to nats). For this 240-parameter model the
# 1-sigma region is 2*deltaLL ~ 240; values < 1 mean the two estimates are
# statistically indistinguishable.
warm = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4,
                                                stop_tol=1e-4, maxiter=25,
                                                dyk_tol=1e-4, dyk_iters=20,
                                                method="apg", warm_start=True,
                                                loop_dyk_iters=1))
from forest_benchmarking_tpu.ops.superoperator_transformations import vec
def cost(est_b):
    v = np.stack([np.asarray(vec(jnp.asarray(est_b[i])))[:, 0]
                  for i in range(est_b.shape[0])])
    p = np.maximum((v @ a.T).real, 1e-12)
    return -(np.asarray(n) * np.log(p)).sum(axis=1)
grand_total = 1000 * (a.shape[0] // 2)   # shots per setting * setting pairs
warm_dev = float(np.max(np.abs(warm - conv)))
warm_llr = float(np.max(cost(warm) - cost(conv)) * 2 * grand_total)
from forest_benchmarking_tpu.ops.lanes_apg import apg_fused, HEADLINE_TUNED_2Q
head = np.asarray(apg_fused(jnp.asarray(a), n, dim=4, use_pallas=False,
                            **HEADLINE_TUNED_2Q))
head_dev = float(np.max(np.abs(head - conv)))
head_llr = float(np.max(cost(head) - cost(conv)) * 2 * grand_total)
# fused-solver parity (the parity_solves_per_sec config, exact production
# settings): f64 deviation vs the reference algorithm converged with TIGHT
# projections (dyk_tol 1e-10 — the mathematically well-defined CPTP-MLE;
# the reference's own output at its default dyk_tol=1e-4 is only defined to
# ~1e-4: restarting it from a different feasible point moves the stall point
# by ~7e-5). Bar: < 1e-6.
from forest_benchmarking_tpu.ops.lanes_apg import apg_fused, PARITY_TUNED_2Q
tight = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4,
                                                 stop_tol=1e-14, maxiter=3000,
                                                 dyk_tol=1e-10,
                                                 dyk_iters=500))
fused = np.asarray(apg_fused(jnp.asarray(a), n, dim=4, use_pallas=False,
                             **PARITY_TUNED_2Q))
fused_dev = float(np.max(np.abs(fused - tight)))
print(json.dumps({"max_deviation_vs_oracle": float(dev),
                  "apg_vs_converged_pgdb": apg_dev,
                  "warm_apg_vs_converged_pgdb": warm_dev,
                  "warm_apg_llr_statistic": warm_llr,
                  "headline_vs_converged_pgdb": head_dev,
                  "headline_llr_statistic": head_llr,
                  "fused_parity_dev": fused_dev}))
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


def _subprocess_tpu(errors: dict) -> dict:
    """Whole-measurement fallback: one fresh process = one fresh tunnel
    connection. Prints the raw perf dict as its last JSON line.

    The parent's live jax client can contend with the child for the tunnel
    (CLAUDE.md: concurrent TPU processes starve each other) — the parent is
    idle here, but the timeout is kept at half the old 3600 s so a starved
    child fails fast enough for main() to still emit partial results."""
    try:
        out = subprocess.run([sys.executable, "-u", __file__, "--tpu-json"],
                             capture_output=True, text=True, timeout=1800)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        errors["tpu_subprocess"] = (
            f"no JSON from fallback subprocess (rc={out.returncode}): "
            f"{out.stderr[-200:]}")
    except Exception as e:  # noqa: BLE001
        errors["tpu_subprocess"] = str(e)[:300]
    return None


def _r(x, ndigits=None):
    """round() that passes None through (partial-result emission)."""
    if x is None:
        return None
    return round(x, ndigits) if ndigits is not None else round(x)


def _ratio(x, y):
    return None if x is None else round(x / y, 4)


def main():
    errors = {}
    try:
        perf = tpu_throughput(errors)
    except Exception as e:  # noqa: BLE001 — in-process measurement died
        errors["tpu_inprocess"] = str(e)[:300]
        perf = _subprocess_tpu(errors)
    if perf is None:
        perf = {"batch": BATCH, "errors": {}}
    g = perf.get
    parity = cpu_parity()
    result = {
        "metric": "2q_process_tomography_mle_throughput",
        "value": _r(g("solves_per_sec"), 2),
        "unit": "solves/sec",
        "vs_baseline": _ratio(g("solves_per_sec"), TARGET_SOLVES_PER_SEC),
        "sustained_solves_per_sec": _r(g("sustained_solves_per_sec"), 2),
        "headline_llr_statistic_f64": parity.get("headline_llr_statistic"),
        "headline_vs_converged_pgdb_f64":
            parity.get("headline_vs_converged_pgdb"),
        "headline_flops_per_solve": _r(g("headline_flops_per_solve")),
        "headline_achieved_gflops": _r(g("headline_achieved_gflops"), 1),
        "xla_warm_apg_solves_per_sec": _r(g("xla_warm_apg_solves_per_sec"), 2),
        "xla_warm_apg_mean_iters": _r(g("xla_warm_apg_mean_iters"), 2),
        "xla_warm_apg_flops_per_solve": _r(g("xla_warm_apg_flops_per_solve")),
        "parity_solves_per_sec": _r(g("parity_solves_per_sec"), 2),
        "parity_vs_baseline": _ratio(g("parity_solves_per_sec"),
                                     TARGET_SOLVES_PER_SEC),
        "parity_flops_per_solve": _r(g("parity_flops_per_solve")),
        "parity_achieved_gflops": _r(g("parity_achieved_gflops"), 1),
        "parity_fraction_vpu_peak": _r(g("parity_fraction_vpu_peak"), 4),
        "fused_parity_dev_f64": parity.get("fused_parity_dev"),
        "mean_rel_frob_err_parity_f32": _r(g("mean_rel_frob_err_parity"), 5),
        "batch": g("batch"),
        "apg_cold_solves_per_sec": _r(g("apg_cold_solves_per_sec"), 2),
        "pgdb_solves_per_sec": _r(g("pgdb_solves_per_sec"), 2),
        "mean_rel_frob_err_f32": _r(g("mean_rel_frob_err"), 5),
        "mean_rel_frob_err_xla_warm_f32":
            _r(g("mean_rel_frob_err_xla_warm"), 5),
        "mean_rel_frob_err_cold_f32": _r(g("mean_rel_frob_err_cold"), 5),
        "mean_rel_frob_err_pgdb_f32": _r(g("mean_rel_frob_err_pgdb"), 5),
        "max_deviation_vs_oracle_f64": parity.get("max_deviation_vs_oracle"),
        "apg_vs_converged_pgdb_f64": parity.get("apg_vs_converged_pgdb"),
        "warm_apg_vs_converged_pgdb_f64":
            parity.get("warm_apg_vs_converged_pgdb"),
        "warm_apg_llr_statistic_f64": parity.get("warm_apg_llr_statistic"),
    }
    if "parity_error" in parity:
        result["parity_error"] = parity["parity_error"]
    errors.update(perf.get("errors", {}))
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    if "--tpu-json" in sys.argv:
        errs = {}
        perf = tpu_throughput(errs)
        perf["errors"].update(errs)
        print(json.dumps(perf))
    else:
        main()
