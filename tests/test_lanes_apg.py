"""Tests for the fused lanes-layout APG solver (ops/lanes_apg.py).

Strategy mirrors the rest of the suite: building blocks against independent
numpy oracles, then end-to-end f64 parity of the full fused solve against the
tight-projection converged reference optimum (the same bar bench.py reports).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                synth_process_datasets)
from forest_benchmarking_tpu.ops.lanes_apg import (
    apg_fused, apg_fused_lanes, raster_a_matrix, _proj_tp, _warm_cp)
from forest_benchmarking_tpu.ops.superoperator_transformations import vec
from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
from oracles import np_proj_cp, np_proj_tp


def _rand_herm_batch(rng, n, b):
    x = rng.randn(b, n, n) + 1j * rng.randn(b, n, n)
    return (x + x.conj().transpose(0, 2, 1)) / 2


def _to_lanes(x):
    return (jnp.asarray(np.real(x).transpose(1, 2, 0)),
            jnp.asarray(np.imag(x).transpose(1, 2, 0)))


def _from_lanes(xr, xi):
    return (np.asarray(xr) + 1j * np.asarray(xi)).transpose(2, 0, 1)


def test_proj_tp_lanes_matches_oracle(rng):
    x = rng.randn(3, 16, 16) + 1j * rng.randn(3, 16, 16)
    xr, xi = _to_lanes(x)
    out = _from_lanes(*_proj_tp(xr, xi, 4))
    want = np.stack([np_proj_tp(x[i]) for i in range(3)])
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_warm_cp_cold_matches_eigh_positive_part(rng):
    h = _rand_herm_batch(rng, 16, 3)
    hr, hi = _to_lanes(h)
    eye = jnp.broadcast_to(jnp.eye(16)[:, :, None], (16, 16, 3)).astype(hr.dtype)
    pos_r, pos_i, _, _ = _warm_cp(hr, hi, eye, jnp.zeros_like(eye), 10,
                                  16, jnp.asarray(1e-30))
    out = _from_lanes(pos_r, pos_i)
    want = np.stack([np_proj_cp(h[i]) for i in range(3)])
    np.testing.assert_allclose(out, want, atol=1e-10)


def test_warm_cp_warm_basis_single_sweep(rng):
    """A 1-sweep projection from the previous eigenbasis matches the exact
    positive part on a nearby matrix (the in-Dykstra warm-V regime)."""
    h = _rand_herm_batch(rng, 16, 2)
    hr, hi = _to_lanes(h)
    eye = jnp.broadcast_to(jnp.eye(16)[:, :, None], (16, 16, 2)).astype(hr.dtype)
    _, _, vr, vi = _warm_cp(hr, hi, eye, jnp.zeros_like(eye), 10, 16,
                            jnp.asarray(1e-30))
    h2 = h + 1e-3 * _rand_herm_batch(rng, 16, 2)
    h2r, h2i = _to_lanes(h2)
    want = np.stack([np_proj_cp(h2[i]) for i in range(2)])
    eps = jnp.asarray(1e-30)
    pos_r, pos_i, _, _ = _warm_cp(h2r, h2i, vr, vi, 1, 16, eps)
    warm_err = np.max(np.abs(_from_lanes(pos_r, pos_i) - want))
    cold_r, cold_i, _, _ = _warm_cp(h2r, h2i, eye, jnp.zeros_like(eye), 1,
                                    16, eps)
    cold_err = np.max(np.abs(_from_lanes(cold_r, cold_i) - want))
    # the carried eigenbasis makes a single sweep dramatically more accurate
    assert warm_err < 1e-4
    assert warm_err < cold_err / 100


def test_raster_a_matrix_reorders_vec(rng):
    a = process_tomo_A_matrix(1)
    x = rng.randn(4, 4) + 1j * rng.randn(4, 4)
    want = a @ np.asarray(vec(jnp.asarray(x)))[:, 0]
    got = raster_a_matrix(a, 4) @ x.reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.slow
def test_apg_fused_output_exactly_tp():
    a = process_tomo_A_matrix(2)
    n, _ = synth_process_datasets(jax.random.PRNGKey(0), jnp.asarray(a), 4, 2,
                                  500, dtype=jnp.float64)
    est = np.asarray(apg_fused(jnp.asarray(a), n, dim=4, use_pallas=False,
                               phases=((2, 1, 1),), init_iters=2,
                               final_iters=2))
    pt = np.trace(est.reshape(-1, 4, 4, 4, 4), axis1=2, axis2=4)
    np.testing.assert_allclose(pt, np.broadcast_to(np.eye(4), pt.shape),
                               atol=1e-14)


@pytest.mark.slow
def test_apg_fused_parity_vs_tight_reference():
    """f64 deviation of the production parity configurations vs the converged
    tight-projection reference optimum is < 1e-6 (the BASELINE parity bar;
    bench.py measures the same quantity). Both the conservative default
    schedule and the round-3 tuned one (PARITY_TUNED_2Q — the config
    bench.py and the cp_method='pallas' route actually run) must hold.

    The 750-shot batch (seed 1757) is a regression guard: its third dataset
    broke 1e-6 (1.5e-6) under the earlier (20,6,1) tuned tail — the sweep
    that set the production tail to 24 (docs/performance.md round 3)."""
    from forest_benchmarking_tpu.ops.lanes_apg import PARITY_TUNED_2Q
    a = process_tomo_A_matrix(2)
    for seed, shots in ((7, 2000), (1757, 750)):
        n, _ = synth_process_datasets(jax.random.PRNGKey(seed),
                                      jnp.asarray(a), 4, 4, shots,
                                      dtype=jnp.float64)
        tight = np.asarray(pgdb_process_estimate_batched(
            jnp.asarray(a), n, dim=4, stop_tol=1e-14, maxiter=3000,
            dyk_tol=1e-10, dyk_iters=500))
        est = np.asarray(apg_fused(jnp.asarray(a), n, dim=4,
                                   use_pallas=False))
        assert np.max(np.abs(est - tight)) < 1e-6, (seed, shots)
        tuned = np.asarray(apg_fused(jnp.asarray(a), n, dim=4,
                                     use_pallas=False, **PARITY_TUNED_2Q))
        assert np.max(np.abs(tuned - tight)) < 1e-6, (seed, shots)


@pytest.mark.slow
def test_apg_fused_1q():
    """The fused solver generalizes to 1Q (dim=2) problems."""
    a = process_tomo_A_matrix(1)
    n, chois = synth_process_datasets(jax.random.PRNGKey(3), jnp.asarray(a),
                                      2, 4, 4000, dtype=jnp.float64)
    tight = np.asarray(pgdb_process_estimate_batched(
        jnp.asarray(a), n, dim=2, stop_tol=1e-14, maxiter=3000,
        dyk_tol=1e-10, dyk_iters=500))
    est = np.asarray(apg_fused(jnp.asarray(a), n, dim=2, use_pallas=False))
    assert np.max(np.abs(est - tight)) < 1e-6


@pytest.mark.slow
def test_pgdb_batched_cp_method_pallas_routes_to_fused():
    a = process_tomo_A_matrix(2)
    n, _ = synth_process_datasets(jax.random.PRNGKey(5), jnp.asarray(a), 4, 2,
                                  1000, dtype=jnp.float64)
    via_route = np.asarray(pgdb_process_estimate_batched(
        jnp.asarray(a), n, dim=4, method="apg", cp_method="pallas"))
    # the dim-4 route applies the round-3 tuned schedule/step
    from forest_benchmarking_tpu.ops.lanes_apg import PARITY_TUNED_2Q
    direct = np.asarray(apg_fused(jnp.asarray(a), n, dim=4, use_pallas=False,
                                  **PARITY_TUNED_2Q))
    np.testing.assert_allclose(via_route, direct, atol=1e-12)
    with pytest.raises(ValueError):
        pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4,
                                      method="pgdb", cp_method="pallas")
    # fused_schedule='headline' routes to the statistical-equivalence config
    from forest_benchmarking_tpu.ops.lanes_apg import HEADLINE_TUNED_2Q
    via_head = np.asarray(pgdb_process_estimate_batched(
        jnp.asarray(a), n, dim=4, method="apg", cp_method="pallas",
        fused_schedule="headline"))
    direct_head = np.asarray(apg_fused(jnp.asarray(a), n, dim=4,
                                       use_pallas=False, **HEADLINE_TUNED_2Q))
    np.testing.assert_allclose(via_head, direct_head, atol=1e-12)
    with pytest.raises(ValueError):
        pgdb_process_estimate_batched(jnp.asarray(a), n, dim=4, method="apg",
                                      cp_method="pallas",
                                      fused_schedule="nope")


@pytest.mark.slow
def test_apg_fused_headline_statistical_equivalence():
    """HEADLINE_TUNED_2Q lands on the converged optimum's likelihood plateau:
    the f64 likelihood-ratio statistic 2*N*deltaLL vs the converged reference
    optimum stays far inside the 1-sigma region (~240 for this 240-parameter
    model), and at or below the XLA warm-APG headline config's statistic on
    the same data (the round-3 scan measured worst 3.66 vs 5.15 over 16
    datasets; docs/performance.md)."""
    from forest_benchmarking_tpu.ops.lanes_apg import HEADLINE_TUNED_2Q

    a = process_tomo_A_matrix(2)
    aj = jnp.asarray(a)
    for seed, shots in ((23 + 1000, 1000), (1007 + 500, 500)):
        n, _ = synth_process_datasets(jax.random.PRNGKey(seed), aj, 4, 4,
                                      shots, dtype=jnp.float64)
        conv = np.asarray(pgdb_process_estimate_batched(
            aj, n, dim=4, stop_tol=1e-12, maxiter=3000, dyk_iters=200))
        est = np.asarray(apg_fused(aj, n, dim=4, use_pallas=False,
                                   **HEADLINE_TUNED_2Q))
        warm = np.asarray(pgdb_process_estimate_batched(
            aj, n, dim=4, stop_tol=1e-4, maxiter=25, dyk_tol=1e-4,
            dyk_iters=20, method="apg", warm_start=True, loop_dyk_iters=1))

        def cost(est_b):
            v = np.stack([np.asarray(vec(jnp.asarray(est_b[i])))[:, 0]
                          for i in range(est_b.shape[0])])
            p = np.maximum((v @ a.T).real, 1e-12)
            return -(np.asarray(n) * np.log(p)).sum(axis=1)

        gt = shots * (a.shape[0] // 2)
        c_conv = cost(conv)
        llr_fused = float(np.max(cost(est) - c_conv) * 2 * gt)
        llr_warm = float(np.max(cost(warm) - c_conv) * 2 * gt)
        assert llr_fused < 20, (seed, shots, llr_fused)
        assert llr_fused < llr_warm + 1.0, (seed, shots, llr_fused, llr_warm)


@pytest.mark.slow
def test_apg_fused_multirank_batch_layout():
    """The vreg layout (``sublanes > 1``: batch reshaped to (B/lanes, lanes)
    so matrix entries fill whole TPU vregs) computes the same estimates as
    the classic rank-3 lanes layout, and holds the < 1e-6 f64 parity bar vs
    the tight-projection converged reference. The multi-rank graph takes the
    Mosaic-safe forms (row-wise matmuls/reconstruction, slice-built
    identities, transpose-style row rotations) whose floating-point op
    sequence differs from the rank-3 path only in reduction order."""
    from forest_benchmarking_tpu.ops.lanes_apg import PARITY_TUNED_2Q
    a = process_tomo_A_matrix(2)
    aj = jnp.asarray(a)
    n, _ = synth_process_datasets(jax.random.PRNGKey(1757), aj, 4, 4, 750,
                                  dtype=jnp.float64)
    tight = np.asarray(pgdb_process_estimate_batched(
        aj, n, dim=4, stop_tol=1e-14, maxiter=3000, dyk_tol=1e-10,
        dyk_iters=500))
    e1 = np.asarray(apg_fused(aj, n, dim=4, use_pallas=False,
                              **PARITY_TUNED_2Q))
    e2 = np.asarray(apg_fused(aj, n, dim=4, use_pallas=False, sublanes=2,
                              **PARITY_TUNED_2Q))
    assert np.max(np.abs(e2 - tight)) < 1e-6
    # layouts agree to reduction-order noise, far below the parity bar
    np.testing.assert_allclose(e2, e1, atol=1e-7)
    # batch not divisible by sublanes is rejected
    with pytest.raises(ValueError):
        apg_fused(aj, n[:3], dim=4, use_pallas=False, sublanes=2)


def test_dykstra_zero_final_iters_is_noop_in_split_case():
    """``final_iters=0`` must skip the final projection entirely whether or
    not ``final_sweeps_rest`` splits the schedule (the split branch used to
    run one stray iteration before its empty fori_loop)."""
    a = process_tomo_A_matrix(1)
    aj = jnp.asarray(a)
    n, _ = synth_process_datasets(jax.random.PRNGKey(7), aj, 2, 4, 500,
                                  dtype=jnp.float64)
    base = np.asarray(apg_fused(aj, n, dim=2, use_pallas=False,
                                final_iters=0))
    split = np.asarray(apg_fused(aj, n, dim=2, use_pallas=False,
                                 final_iters=0, final_sweeps_rest=0))
    np.testing.assert_array_equal(split, base)


def test_fused_schedule_headline_rejected_for_non_2q():
    """The tuned headline schedule is validated for dim=4 only; asking for
    it at another dim must raise, not silently run the parity schedule."""
    a = process_tomo_A_matrix(1)
    aj = jnp.asarray(a)
    n, _ = synth_process_datasets(jax.random.PRNGKey(8), aj, 2, 4, 500,
                                  dtype=jnp.float64)
    with pytest.raises(ValueError, match="dim=4"):
        pgdb_process_estimate_batched(aj, n, dim=2, method="apg",
                                      cp_method="pallas",
                                      fused_schedule="headline")


def test_parity_margin_guard_worst_measured_datasets():
    """Quick-suite drift guard for the <1e-6 parity contract (round-4).

    The fused PARITY_TUNED_2Q schedule's f64 deviation vs the
    tight-projection converged reference optimum measured 8.4e-7 worst-case
    over the round-3/4 dataset sweeps — 16% of headroom against the
    advertised <1e-6 bar. This test pins the two worst measured dataset
    families (counts + gold optimum checked in at tests/data/, produced by
    the 8-family sweep recorded in docs/performance.md) so a future schedule
    tuning pass cannot silently spend the remaining margin.
    """
    import os
    from forest_benchmarking_tpu.ops.lanes_apg import PARITY_TUNED_2Q

    path = os.path.join(os.path.dirname(__file__), "data",
                        "parity_worstcase.npz")
    data = np.load(path)
    a = jnp.asarray(process_tomo_A_matrix(2))
    margins = []
    for i in range(2):
        n = jnp.asarray(data[f"n_{i}"])
        gold = data[f"gold_{i}"]
        seed, shots, dev_at_save = data[f"meta_{i}"]
        est = np.asarray(apg_fused(a, n, dim=4, use_pallas=False,
                                   **PARITY_TUNED_2Q))
        dev = float(np.max(np.abs(est - gold)))
        margins.append((int(seed), int(shots), dev))
        assert dev < 1e-6, (
            f"parity contract broken on worst-case dataset seed={int(seed)} "
            f"shots={int(shots)}: dev {dev:.3e} (was {dev_at_save:.3e} "
            f"when the fixture was measured)")
        # the schedule itself should not have drifted relative to the saved
        # measurement (allow small cross-platform reduction-order noise)
        assert abs(dev - float(dev_at_save)) < 2e-7, (seed, shots, dev,
                                                      dev_at_save)
    print("parity margins (seed, shots, dev):", margins)
