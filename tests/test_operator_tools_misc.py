"""Tests for calculational helpers, channel application/composition, validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.ops import (
    partial_trace, outer_product, inner_product, sqrtm_psd, kron, dag,
    apply_kraus_ops_2_state, apply_choi_matrix_2_state,
    tensor_channel_kraus, compose_channel_kraus, pauli_twirl_chi_matrix,
    kraus2choi, kraus2chi, kraus2superop,
    is_square_matrix, is_symmetric_matrix, is_identity_matrix,
    is_idempotent_matrix, is_normal_matrix, is_hermitian_matrix,
    is_unitary_matrix, is_positive_definite_matrix,
    is_positive_semidefinite_matrix,
    kraus_operators_are_valid, choi_is_hermitian_preserving,
    choi_is_trace_preserving, choi_is_completely_positive, choi_is_cptp,
    choi_is_unital, choi_is_unitary,
    rand_map_with_BCSZ_dist, haar_rand_state,
)
from forest_benchmarking_tpu.utils import I_MAT, X_MAT, Y_MAT, Z_MAT, H_MAT


def amplitude_damping_kraus(p):
    k0 = np.array([[1, 0], [0, np.sqrt(1 - p)]], dtype=complex)
    k1 = np.array([[0, np.sqrt(p)], [0, 0]], dtype=complex)
    return [k0, k1]


# ------------------------------ calculational ------------------------------

def test_partial_trace_bell():
    bell = np.zeros((4, 1), dtype=complex)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    rho = bell @ bell.conj().T
    reduced = np.asarray(partial_trace(jnp.asarray(rho), keep=[0], dims=[2, 2]))
    assert np.allclose(reduced, np.eye(2) / 2, atol=1e-12)


def test_partial_trace_product_state():
    a = np.array([[0.7, 0.1], [0.1, 0.3]], dtype=complex)
    b = np.array([[0.2, 0.0], [0.0, 0.8]], dtype=complex)
    rho = np.kron(a, b)
    assert np.allclose(partial_trace(jnp.asarray(rho), [0], [2, 2]), a, atol=1e-12)
    assert np.allclose(partial_trace(jnp.asarray(rho), [1], [2, 2]), b, atol=1e-12)


def test_partial_trace_three_factors():
    rng = np.random.RandomState(0)
    mats = [rng.randn(2, 2) + 1j * rng.randn(2, 2) for _ in range(3)]
    mats = [(m + m.conj().T) / 2 for m in mats]
    mats = [m / np.trace(m) for m in mats]
    rho = np.kron(np.kron(mats[0], mats[1]), mats[2])
    out = np.asarray(partial_trace(jnp.asarray(rho), keep=[0, 2], dims=[2, 2, 2]))
    assert np.allclose(out, np.kron(mats[0], mats[2]), atol=1e-12)


def test_partial_trace_batched():
    rng = np.random.RandomState(1)
    rhos = rng.randn(5, 4, 4) + 1j * rng.randn(5, 4, 4)
    batched = np.asarray(partial_trace(jnp.asarray(rhos), keep=[1], dims=[2, 2]))
    looped = np.stack([np.asarray(partial_trace(jnp.asarray(r), [1], [2, 2]))
                       for r in rhos])
    assert np.allclose(batched, looped)


def test_outer_inner_product():
    v1 = jnp.array([[1.0], [1j]]) / np.sqrt(2)
    v2 = jnp.array([[1.0], [0.0]])
    assert np.allclose(outer_product(v1, v2), np.array([[1, 0], [1j, 0]]) / np.sqrt(2))
    assert np.allclose(inner_product(v1, v2), np.array([[1 / np.sqrt(2)]]))


def test_sqrtm_psd():
    rng = np.random.RandomState(2)
    a = rng.randn(4, 4) + 1j * rng.randn(4, 4)
    m = a @ a.conj().T
    s = np.asarray(sqrtm_psd(jnp.asarray(m)))
    assert np.allclose(s @ s, m, atol=1e-10)


def test_kron_matches_numpy():
    rng = np.random.RandomState(3)
    a = rng.randn(2, 3)
    b = rng.randn(4, 2)
    assert np.allclose(kron(jnp.asarray(a), jnp.asarray(b)), np.kron(a, b))


# -------------------------- apply / compose --------------------------------

def test_apply_kraus_amp_damp():
    rho = np.array([[0.3, 0.2], [0.2, 0.7]], dtype=complex)
    ks = amplitude_damping_kraus(0.4)
    expected = sum(k @ rho @ k.conj().T for k in ks)
    out = apply_kraus_ops_2_state(ks, jnp.asarray(rho))
    assert np.allclose(out, expected, atol=1e-12)


def test_apply_choi_matches_kraus():
    rho = np.array([[0.3, 0.2], [0.2, 0.7]], dtype=complex)
    ks = amplitude_damping_kraus(0.4)
    choi = kraus2choi(ks)
    out_choi = apply_choi_matrix_2_state(choi, jnp.asarray(rho))
    out_kraus = apply_kraus_ops_2_state(ks, jnp.asarray(rho))
    assert np.allclose(out_choi, out_kraus, atol=1e-12)


def test_apply_kraus_nonsquare():
    # projective measurement <0| : state collapses to scalar prob
    m = np.array([[1.0, 0.0]], dtype=complex)
    rho = np.array([[0.3, 0.2], [0.2, 0.7]], dtype=complex)
    out = np.asarray(apply_kraus_ops_2_state([m], jnp.asarray(rho)))
    assert out.shape == (1, 1)
    assert np.allclose(out, [[0.3]])


def test_tensor_channel_kraus():
    ks = tensor_channel_kraus([jnp.asarray(H_MAT)], [jnp.asarray(X_MAT)])
    assert np.allclose(np.asarray(ks)[0], np.kron(H_MAT, X_MAT))


def test_compose_channel_kraus():
    ks = compose_channel_kraus([jnp.asarray(H_MAT)], [jnp.asarray(X_MAT)])
    assert np.allclose(np.asarray(ks)[0], H_MAT @ X_MAT)


def test_compose_channels_matches_superop_product():
    ks1 = amplitude_damping_kraus(0.2)
    ks2 = amplitude_damping_kraus(0.3)
    composed = compose_channel_kraus(ks2, ks1)
    so = kraus2superop(composed)
    so_expected = np.asarray(kraus2superop(ks2)) @ np.asarray(kraus2superop(ks1))
    assert np.allclose(so, so_expected, atol=1e-12)


def test_pauli_twirl_chi():
    chi = kraus2chi(amplitude_damping_kraus(0.3))
    twirled = np.asarray(pauli_twirl_chi_matrix(chi))
    assert np.allclose(twirled, np.diag(np.diag(np.asarray(chi))))


# ------------------------------ validation ---------------------------------

def test_operator_predicates():
    assert is_square_matrix(np.eye(3))
    assert not is_square_matrix(np.ones((2, 3)))
    assert is_symmetric_matrix(np.array([[1, 2], [2, 1]]))
    assert not is_symmetric_matrix(np.array([[1, 2], [3, 1]]))
    assert is_identity_matrix(np.eye(4))
    proj = np.array([[1, 0], [0, 0]])
    assert is_idempotent_matrix(proj)
    assert is_normal_matrix(X_MAT)
    assert is_hermitian_matrix(Y_MAT)
    assert not is_hermitian_matrix(np.array([[0, 1], [0, 0]], dtype=complex))
    assert is_unitary_matrix(H_MAT)
    assert is_positive_definite_matrix(np.diag([1.0, 2.0]))
    assert not is_positive_definite_matrix(np.diag([1.0, -2.0]))
    assert is_positive_semidefinite_matrix(np.diag([1.0, 0.0]))


def test_kraus_validity():
    assert kraus_operators_are_valid(amplitude_damping_kraus(0.1))
    assert not kraus_operators_are_valid([0.5 * I_MAT])


def test_choi_predicates():
    choi_h = kraus2choi(jnp.asarray(H_MAT))
    assert choi_is_hermitian_preserving(choi_h)
    assert choi_is_trace_preserving(choi_h)
    assert choi_is_completely_positive(choi_h)
    assert choi_is_cptp(choi_h)
    assert choi_is_unital(choi_h)
    assert choi_is_unitary(choi_h)

    choi_ad = kraus2choi(amplitude_damping_kraus(0.3))
    assert choi_is_cptp(choi_ad)
    assert not choi_is_unital(choi_ad)
    assert not choi_is_unitary(choi_ad)


def test_choi2kraus_f32_unitary_channel_rank1():
    """In float32, eigh noise on a rank-1 Choi is ~1e-6 — far above the
    reference's fixed 1e-9 cut. The dtype-aware default must still return
    exactly ONE Kraus operator for a unitary channel, and choi_is_unitary
    must classify it correctly."""
    import jax
    from forest_benchmarking_tpu.ops.superoperator_transformations import (
        kraus2choi, choi2kraus)
    from forest_benchmarking_tpu.ops.validate_superoperator import (
        choi_is_unitary)
    from forest_benchmarking_tpu.ops.random_operators import haar_rand_unitary
    u = np.asarray(haar_rand_unitary(jax.random.PRNGKey(5), 4)).astype(
        np.complex64)
    choi = np.asarray(kraus2choi(jnp.asarray(u)[None])).astype(np.complex64)
    ks = choi2kraus(choi)
    assert len(ks) == 1
    assert choi_is_unitary(choi)
    # the recovered operator matches u up to global phase
    k = ks[0] / np.exp(1j * np.angle(ks[0][0, 0] / u[0, 0]))
    np.testing.assert_allclose(k, u, atol=1e-5)
