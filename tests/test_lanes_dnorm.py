"""Fused lanes-layout diamond-norm solver (ops/lanes_dnorm.py).

Reference program: the Watrous SDP the reference solves with cvxpy
(forest/benchmarking/distance_measures.py:378-433). Gold here is the dense
eigh/autodiff solver (itself validated against analytic cases and the
reference's convention tests in test_distance_measures.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops.lanes_dnorm import dnorm_fused
from forest_benchmarking_tpu.distance_measures import diamond_norm_distance
from forest_benchmarking_tpu.ops.random_operators import rand_map_with_BCSZ_dist


def _choi_depol(p, d=2):
    """Choi of the depolarizing channel (column-stacking, H_in (x) H_out)."""
    omega = np.zeros((d * d, d * d), complex)
    for i in range(d):
        for j in range(d):
            omega[i * d + i, j * d + j] = 1.0
    return (1 - p) * omega + p * np.kron(np.eye(d), np.eye(d)) / d


def test_dnorm_fused_analytic_depolarizing_1q():
    """dnorm(depol_p, I) = 3p/2 for a qubit (reference test value)."""
    c_id = jnp.asarray(_choi_depol(0.0))
    for p in (0.1, 0.3, 0.7):
        v = float(dnorm_fused(jnp.asarray(_choi_depol(p)), c_id, dim=2))
        assert abs(v - 1.5 * p) < 1e-5, (p, v)


def test_dnorm_fused_self_distance_is_zero():
    """J = 0 must hit the ||A|| floor, not 0/0 = NaN."""
    key = jax.random.PRNGKey(2)
    chois = rand_map_with_BCSZ_dist(key, 2, 4, batch=(3,))
    v = np.asarray(dnorm_fused(chois, chois, dim=2))
    assert np.all(np.isfinite(v))
    assert np.max(np.abs(v)) < 1e-10


def test_dnorm_fused_orthogonal_unitaries_1q():
    """Perfectly distinguishable channels: dnorm(I, X) = 2."""
    from forest_benchmarking_tpu.ops.superoperator_transformations import (
        kraus2choi)
    eye = kraus2choi(jnp.eye(2, dtype=jnp.complex128)[None])
    x = kraus2choi(jnp.asarray([[0, 1], [1, 0]], jnp.complex128)[None])
    v = float(dnorm_fused(eye, x, dim=2))
    assert abs(v - 2.0) < 1e-6


def test_diamond_norm_distance_fused_method_matches_dense_1q():
    """method="fused" through the public API agrees with the dense path."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    c0 = rand_map_with_BCSZ_dist(k1, 2, 4, batch=(6,))
    c1 = rand_map_with_BCSZ_dist(k2, 2, 4, batch=(6,))
    dense = np.asarray(diamond_norm_distance(c0, c1, method="dense",
                                             num_iters=400, stop_tol=0.0))
    fused = np.asarray(diamond_norm_distance(c0, c1, method="fused"))
    np.testing.assert_allclose(fused, dense, atol=5e-6)


@pytest.mark.slow
def test_dnorm_fused_matches_dense_gold_2q():
    """2Q BCSZ pairs: fused f64 vs an 800-iter dense gold, <1e-6 bar
    (VERDICT round-4 item 5 accuracy contract; the fused TPU throughput
    figure is only honest if this parity holds)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    c0 = rand_map_with_BCSZ_dist(k1, 4, kraus_rank=6, batch=(8,))
    c1 = rand_map_with_BCSZ_dist(k2, 4, kraus_rank=6, batch=(8,))
    gold = np.asarray(diamond_norm_distance(c0, c1, method="dense",
                                            num_iters=800, num_restarts=2,
                                            stop_tol=0.0))
    fused = np.asarray(dnorm_fused(c0, c1))
    err = np.abs(fused - gold)
    assert err.max() < 1e-6, (err.max(), err.mean())


@pytest.mark.slow
def test_dnorm_planes_gradient_matches_autodiff():
    """The hand-derived Wirtinger gradient of the planes objective equals
    jax.grad of the dense objective (same rho parameterization)."""
    from forest_benchmarking_tpu.ops.lanes_apg import (_cmm, _cmm_hconj_left,
                                                       _eye_planes,
                                                       _hermitianize,
                                                       _multi_sweep)
    from forest_benchmarking_tpu.ops.lanes_dnorm import _grad_s, _lift_apply

    dim, n = 2, 4
    rng = np.random.default_rng(3)
    jm = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    jm = (jm + jm.conj().T) / 2
    a = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))

    def dense_obj(ari):
        am = ari[0] + 1j * ari[1]
        s = am / jnp.sqrt(jnp.sum(jnp.abs(am) ** 2))
        lift = jnp.kron(s, jnp.eye(dim, dtype=am.dtype))
        m = lift.conj().T @ jnp.asarray(jm) @ lift
        m = (m + m.conj().T) / 2
        evals = jnp.linalg.eigvalsh(m)
        return jnp.sum(jax.nn.relu(evals))

    ari = jnp.stack([jnp.real(jnp.asarray(a)), jnp.imag(jnp.asarray(a))])
    g_auto = np.asarray(jax.grad(dense_obj)(ari))

    # planes gradient at a fully-converged eigenbasis (12 cold sweeps)
    jr = jnp.real(jnp.asarray(jm))[..., None]
    ji = jnp.imag(jnp.asarray(jm))[..., None]
    a_r = jnp.real(jnp.asarray(a))[..., None]
    a_i = jnp.imag(jnp.asarray(a))[..., None]
    nu2 = jnp.sum(a_r * a_r + a_i * a_i, axis=(0, 1))
    nu = jnp.sqrt(nu2)
    sr, si = a_r / nu, a_i / nu
    er = _eye_planes(n, (1,), jr.dtype)
    ei = jnp.zeros_like(er)
    w_r, w_i = _lift_apply(sr, si, er, ei, dim)
    jw_r, jw_i = _cmm(jr, ji, w_r, w_i, n)
    mp_r, mp_i = _cmm_hconj_left(w_r, w_i, jw_r, jw_i, n)
    mp_r, mp_i = _hermitianize(mp_r, mp_i)
    ar_, ai_, vr, vi = _multi_sweep(mp_r, mp_i, er, ei, 1e-30, n, 12)
    w2_r, w2_i = _lift_apply(sr, si, vr, vi, dim)
    x_r, x_i = _cmm(jr, ji, w2_r, w2_i, n)
    h = [(ar_[w, w] > 0).astype(jr.dtype) for w in range(n)]
    x_r = jnp.stack([x_r[:, w] * h[w] for w in range(n)], axis=1)
    x_i = jnp.stack([x_i[:, w] * h[w] for w in range(n)], axis=1)
    gs_r, gs_i = _grad_s(x_r, x_i, vr, vi, dim)
    c = jnp.sum(a_r * gs_r + a_i * gs_i, axis=(0, 1))
    g_r = np.asarray(2 * gs_r / nu - 2 * c * a_r / (nu2 * nu))[..., 0]
    g_i = np.asarray(2 * gs_i / nu - 2 * c * a_i / (nu2 * nu))[..., 0]

    np.testing.assert_allclose(g_r, g_auto[0], atol=1e-10)
    np.testing.assert_allclose(g_i, g_auto[1], atol=1e-10)
