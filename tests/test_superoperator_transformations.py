"""Superoperator conversion tests: known channels, round trips, batching.

Mirrors the reference test strategy (SURVEY.md section 4 tier 1): known-channel
fixtures defined inline, algebraic round trips, and hand-computable answers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import forest_benchmarking_tpu.ops.superoperator_transformations as sot
from forest_benchmarking_tpu.utils import I_MAT, X_MAT, Y_MAT, Z_MAT, H_MAT

# ---- known channel fixtures (independently defined from textbook formulas) ----

def amplitude_damping_kraus(p):
    k0 = np.array([[1, 0], [0, np.sqrt(1 - p)]], dtype=complex)
    k1 = np.array([[0, np.sqrt(p)], [0, 0]], dtype=complex)
    return [k0, k1]


def bit_flip_kraus(p):
    return [np.sqrt(1 - p) * I_MAT, np.sqrt(p) * X_MAT]


def depolarizing_kraus(p):
    return [np.sqrt(1 - 3 * p / 4) * I_MAT] + \
           [np.sqrt(p / 4) * P for P in (X_MAT, Y_MAT, Z_MAT)]


def np_vec(m):
    return np.asarray(m).T.reshape(-1, 1)


def np_kraus2superop(ks):
    return sum(np.kron(k.conj(), k) for k in ks)


def np_kraus2choi(ks):
    return sum(np_vec(k) @ np_vec(k).conj().T for k in ks)


P = 0.25


def test_vec_unvec_convention():
    a = jnp.array([[1, 2], [3, 4]], dtype=jnp.complex128)
    v = sot.vec(a)
    # column stacking: (a, c, b, d)
    assert np.allclose(np.asarray(v).ravel(), [1, 3, 2, 4])
    assert np.allclose(sot.unvec(v), a)
    # batched
    batch = jnp.stack([a, 2 * a])
    assert np.allclose(sot.unvec(sot.vec(batch)), batch)


def test_vec_nonsquare():
    a = jnp.arange(6, dtype=jnp.complex128).reshape(2, 3)
    v = sot.vec(a)
    assert v.shape == (6, 1)
    assert np.allclose(sot.unvec(v, shape=(2, 3)), a)


def test_kraus2superop_known():
    ks = amplitude_damping_kraus(P)
    expected = np_kraus2superop(ks)
    assert np.allclose(sot.kraus2superop(ks), expected, atol=1e-12)


def test_kraus2superop_single_op_and_stacked():
    h = jnp.asarray(H_MAT)
    expected = np.kron(H_MAT.conj(), H_MAT)
    assert np.allclose(sot.kraus2superop(h), expected)
    assert np.allclose(sot.kraus2superop(h[None]), expected)


def test_kraus2superop_nonsquare():
    # measurement operator M = <0| (1x2), superop should be 1x4
    m = np.array([[1.0, 0.0]], dtype=complex)
    out = sot.kraus2superop([m])
    assert out.shape == (1, 4)
    assert np.allclose(out, np.kron(m.conj(), m))


def test_kraus2choi_known():
    ks = depolarizing_kraus(P)
    assert np.allclose(sot.kraus2choi(ks), np_kraus2choi(ks), atol=1e-12)


def test_kraus2chi_unitary_x():
    # chi of a perfect X gate: single 1 at the XX entry (unnormalized basis -> 1*...)
    chi = np.asarray(sot.kraus2chi(jnp.asarray(X_MAT)))
    expected = np.zeros((4, 4), dtype=complex)
    expected[1, 1] = 1.0
    assert np.allclose(chi, expected, atol=1e-12)


def test_chi_of_bit_flip():
    chi = np.asarray(sot.kraus2chi(bit_flip_kraus(P)))
    expected = np.diag([1 - P, P, 0, 0]).astype(complex)
    assert np.allclose(chi, expected, atol=1e-12)


def test_superop_choi_involution():
    ks = amplitude_damping_kraus(P)
    so = sot.kraus2superop(ks)
    choi = sot.kraus2choi(ks)
    assert np.allclose(sot.superop2choi(so), choi, atol=1e-12)
    assert np.allclose(sot.choi2superop(choi), so, atol=1e-12)
    # involution property
    assert np.allclose(sot.superop2choi(sot.superop2choi(so)), so)


def test_pauli_liouville_of_identity_channel():
    pl = sot.kraus2pauli_liouville(jnp.asarray(I_MAT))
    assert np.allclose(pl, np.eye(4), atol=1e-12)


def test_pauli_liouville_of_x_gate():
    pl = np.asarray(sot.kraus2pauli_liouville(jnp.asarray(X_MAT)))
    expected = np.diag([1.0, 1.0, -1.0, -1.0])
    assert np.allclose(pl, expected, atol=1e-12)


def test_amp_damp_pauli_liouville():
    # textbook PTM of amplitude damping
    pl = np.asarray(sot.kraus2pauli_liouville(amplitude_damping_kraus(P)))
    s = np.sqrt(1 - P)
    expected = np.array([
        [1, 0, 0, 0],
        [0, s, 0, 0],
        [0, 0, s, 0],
        [P, 0, 0, 1 - P],
    ])
    assert np.allclose(pl, expected, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2])
def test_round_trips_random_cptp(n, rng):
    from forest_benchmarking_tpu.ops.random_operators import rand_map_with_BCSZ_dist
    import jax
    key = jax.random.PRNGKey(3 + n)
    dim = 2 ** n
    choi = rand_map_with_BCSZ_dist(key, dim, kraus_rank=dim ** 2)
    pl = sot.choi2pauli_liouville(choi)
    assert np.allclose(sot.pauli_liouville2choi(pl), choi, atol=1e-10)
    chi = sot.choi2chi(choi)
    assert np.allclose(sot.chi2choi(chi), choi, atol=1e-10)
    so = sot.choi2superop(choi)
    assert np.allclose(sot.superop2pauli_liouville(so), pl, atol=1e-10)
    assert np.allclose(sot.pauli_liouville2superop(pl), so, atol=1e-10)


def test_choi2kraus_reconstructs_channel():
    ks = amplitude_damping_kraus(P)
    choi = sot.kraus2choi(ks)
    ks_back = sot.choi2kraus(choi)
    choi_back = sot.kraus2choi(jnp.stack([jnp.asarray(k) for k in ks_back], axis=-3))
    assert np.allclose(choi_back, choi, atol=1e-10)


def test_chi2kraus_round_trip():
    ks = bit_flip_kraus(P)
    chi = sot.kraus2chi(ks)
    ks_back = sot.chi2kraus(chi)
    assert np.allclose(sot.kraus2chi(jnp.stack(ks_back, axis=-3)), chi, atol=1e-10)


def test_p2c_c2p_inverse():
    for dim in (2, 4):
        p2c = np.asarray(sot.pauli2computational_basis_matrix(dim))
        c2p = np.asarray(sot.computational2pauli_basis_matrix(dim))
        assert np.allclose(c2p @ p2c, np.eye(dim * dim), atol=1e-12)
    # column k of p2c is vec(sigma_k): check sigma_x on 1 qubit
    p2c = np.asarray(sot.pauli2computational_basis_matrix(2))
    assert np.allclose(p2c[:, 1], np_vec(X_MAT).ravel())


def test_batched_conversions_match_loop():
    import jax
    key = jax.random.PRNGKey(0)
    from forest_benchmarking_tpu.ops.random_operators import rand_map_with_BCSZ_dist
    chois = rand_map_with_BCSZ_dist(key, 2, kraus_rank=2, batch=(5,))
    batched = np.asarray(sot.choi2pauli_liouville(chois))
    looped = np.stack([np.asarray(sot.choi2pauli_liouville(c)) for c in chois])
    assert np.allclose(batched, looped, atol=1e-12)
