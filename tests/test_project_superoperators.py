"""Tests for CP/TP/TNI/physical/unitary projections and the state projection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.ops import (
    proj_choi_to_completely_positive, proj_choi_to_trace_non_increasing,
    proj_choi_to_trace_preserving, proj_choi_to_physical, proj_choi_to_unitary,
    project_state_matrix_to_physical,
    choi_is_completely_positive, choi_is_trace_preserving, choi_is_cptp,
    kraus2choi, rand_map_with_BCSZ_dist, partial_trace,
)
from forest_benchmarking_tpu.utils import I_MAT, X_MAT


def np_proj_physical_reference(choi, make_tp=True):
    """Independent numpy re-derivation of Dykstra with the Birgin criterion,
    used as a parity oracle against the reference algorithm's semantics."""
    def proj_cp(c):
        h = (c + c.conj().T) / 2
        w, v = np.linalg.eigh(h)
        w = np.clip(w, 0, None)
        return (v * w) @ v.conj().T

    def proj_tp(c):
        dim = int(np.sqrt(c.shape[0]))
        pt = np.trace(c.reshape(dim, dim, dim, dim), axis1=1, axis2=3)
        diff = pt - np.eye(dim)
        return c - np.kron(diff / dim, np.eye(dim))

    old_cp = np.zeros_like(choi)
    old_tp = np.zeros_like(choi)
    last_cp_proj = np.zeros_like(choi)
    last = choi
    while True:
        pre_cp = last - old_cp
        cp_proj = proj_cp(pre_cp)
        new_cp = cp_proj - pre_cp
        pre_tp = cp_proj - old_tp
        new = proj_tp(pre_tp)
        new_tp = new - pre_tp
        crit = (np.linalg.norm(new_cp - old_cp) ** 2
                + np.linalg.norm(new_tp - old_tp) ** 2
                + 2 * abs(np.vdot(old_tp, new - last))
                + 2 * abs(np.vdot(old_cp, cp_proj - last_cp_proj)))
        if crit < 1e-4:
            return new
        old_cp, old_tp, last_cp_proj, last = new_cp, new_tp, cp_proj, new


def test_proj_cp_clips_negative_eigs():
    m = np.diag([1.0, 0.5, -0.3, 0.1]).astype(complex)
    out = np.asarray(proj_choi_to_completely_positive(jnp.asarray(m)))
    assert np.allclose(out, np.diag([1.0, 0.5, 0.0, 0.1]))


def test_proj_tp_fixes_partial_trace():
    key = jax.random.PRNGKey(0)
    choi = rand_map_with_BCSZ_dist(key, 2, 4) + 0.2 * jnp.eye(4)
    out = proj_choi_to_trace_preserving(choi)
    pt = np.asarray(partial_trace(out, keep=[0], dims=[2, 2]))
    assert np.allclose(pt, np.eye(2), atol=1e-10)


def test_proj_tni_leaves_tni_unchanged():
    # a CPTP map is trace non-increasing: projection should be (near) identity op
    key = jax.random.PRNGKey(1)
    choi = rand_map_with_BCSZ_dist(key, 2, 2)
    out = proj_choi_to_trace_non_increasing(choi)
    assert np.allclose(out, choi, atol=1e-9)


def test_proj_physical_produces_cptp():
    key = jax.random.PRNGKey(2)
    choi = rand_map_with_BCSZ_dist(key, 2, 4)
    noisy = choi + 0.15 * jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    noisy = (noisy + noisy.conj().T) / 2
    out = proj_choi_to_physical(noisy)
    # Dykstra stops at tol 1e-4 and ends on the TP projection (like the
    # reference), so CP holds approximately and TP holds to numerical precision
    assert choi_is_completely_positive(out, atol=1e-2)
    assert choi_is_trace_preserving(out, atol=1e-10)


def test_proj_physical_matches_numpy_dykstra():
    rng = np.random.RandomState(11)
    base = rng.randn(4, 4) + 1j * rng.randn(4, 4)
    noisy = (base + base.conj().T) / 2 + np.kron(np.eye(2), np.eye(2))
    ours = np.asarray(proj_choi_to_physical(jnp.asarray(noisy)))
    oracle = np_proj_physical_reference(noisy)
    assert np.max(np.abs(ours - oracle)) < 1e-8


def test_proj_physical_batched_matches_loop():
    rng = np.random.RandomState(5)
    chois = []
    for _ in range(4):
        b = rng.randn(4, 4) + 1j * rng.randn(4, 4)
        chois.append((b + b.conj().T) / 2 + np.eye(4))
    chois = np.stack(chois)
    batched = np.asarray(proj_choi_to_physical(jnp.asarray(chois)))
    looped = np.stack([np.asarray(proj_choi_to_physical(jnp.asarray(c))) for c in chois])
    assert np.max(np.abs(batched - looped)) < 1e-8


def test_proj_unitary_recovers_unitary():
    # perturb the Choi of X a little; the closest unitary should be X (up to phase)
    choi_x = kraus2choi(jnp.asarray(X_MAT))
    noisy = choi_x + 0.01 * jnp.eye(4)
    out = proj_choi_to_unitary(noisy)
    assert np.allclose(np.asarray(out), np.asarray(choi_x), atol=1e-6)


# ---------------------------- state projection ----------------------------

def np_wizard_reference(rho):
    """Independent numpy re-derivation of the Smolin waterfilling loop."""
    rho = rho / np.trace(rho)
    d = rho.shape[0]
    w, v = np.linalg.eigh(rho)
    if w.min() >= 0:
        return rho
    lam = list(w[::-1])
    new = [0.0] * d
    i = d
    acc = 0.0
    while lam[i - 1] + acc / i < 0:
        acc += lam[i - 1]
        i -= 1
    for j in range(i):
        new[j] = lam[j] + acc / i
    new = np.array(new[::-1])
    return (v * new) @ v.conj().T


@pytest.mark.parametrize("d", [2, 4, 8])
def test_project_state_matrix_matches_wizard(d):
    rng = np.random.RandomState(d)
    for _ in range(20):
        h = rng.randn(d, d) + 1j * rng.randn(d, d)
        h = (h + h.conj().T) / 2
        h = h / np.trace(h) + 0.1 * np.eye(d)  # keep trace positive-ish
        ours = np.asarray(project_state_matrix_to_physical(jnp.asarray(h)))
        oracle = np_wizard_reference(h)
        assert np.max(np.abs(ours - oracle)) < 1e-10


def test_project_state_matrix_on_physical_state_is_identityish():
    rho = np.diag([0.7, 0.3]).astype(complex)
    out = np.asarray(project_state_matrix_to_physical(jnp.asarray(rho)))
    assert np.allclose(out, rho, atol=1e-12)


def test_project_state_matrix_known_example():
    # diag(0.9, 0.4, -0.3): trace 1; waterfilling zeroes -0.3 and spreads -0.15 each
    rho = np.diag([0.9, 0.4, -0.3]).astype(complex)
    out = np.asarray(project_state_matrix_to_physical(jnp.asarray(rho)))
    assert np.allclose(np.sort(np.diag(out).real), [0.0, 0.25, 0.75], atol=1e-12)


def test_project_state_matrix_batched():
    rng = np.random.RandomState(1)
    hs = rng.randn(6, 4, 4) + 1j * rng.randn(6, 4, 4)
    hs = (hs + hs.conj().transpose(0, 2, 1)) / 2 + 2 * np.eye(4)
    batched = np.asarray(project_state_matrix_to_physical(jnp.asarray(hs)))
    looped = np.stack([np_wizard_reference(h) for h in hs])
    assert np.max(np.abs(batched - looped)) < 1e-10


def test_ns_cp_projection_matches_eigh():
    from forest_benchmarking_tpu.ops import proj_choi_to_completely_positive
    from forest_benchmarking_tpu.ops.project_superoperators import (
        proj_choi_to_completely_positive_ns)
    rng = np.random.RandomState(3)
    h = rng.randn(6, 16, 16) + 1j * rng.randn(6, 16, 16)
    h = (h + h.conj().transpose(0, 2, 1)) / 2
    exact = np.asarray(proj_choi_to_completely_positive(jnp.asarray(h)))
    approx = np.asarray(proj_choi_to_completely_positive_ns(jnp.asarray(h), 24))
    assert np.max(np.abs(exact - approx)) < 1e-10


def test_proj_physical_ns_method():
    rng = np.random.RandomState(7)
    base = rng.randn(4, 4) + 1j * rng.randn(4, 4)
    noisy = (base + base.conj().T) / 2 + np.eye(4)
    eigh_out = np.asarray(proj_choi_to_physical(jnp.asarray(noisy)))
    ns_out = np.asarray(proj_choi_to_physical(jnp.asarray(noisy),
                                              cp_method="ns", ns_iters=30))
    assert np.max(np.abs(eigh_out - ns_out)) < 1e-6
    with pytest.raises(ValueError):
        proj_choi_to_physical(jnp.asarray(noisy), cp_method="banana")
