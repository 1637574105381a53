"""Statistical moment tests for random operators (reference test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.ops import (
    ginibre_matrix_complex, haar_rand_unitary, haar_rand_state,
    ginibre_state_matrix, bures_measure_state_matrix, rand_map_with_BCSZ_dist,
    permute_tensor_factors, choi_is_cptp, choi_is_trace_preserving,
    choi_is_completely_positive, kron,
)


def test_ginibre_moments():
    key = jax.random.PRNGKey(0)
    g = np.asarray(ginibre_matrix_complex(key, 64, 64, batch=(16,)))
    assert abs(g.mean()) < 0.02
    assert abs(np.var(g.real) - 1.0) < 0.05
    assert abs(np.var(g.imag) - 1.0) < 0.05


def test_haar_unitary_is_unitary():
    key = jax.random.PRNGKey(1)
    u = np.asarray(haar_rand_unitary(key, 4))
    assert np.allclose(u @ u.conj().T, np.eye(4), atol=1e-12)


def test_haar_first_moment():
    # E[U rho U^dag] = I/d for Haar-random U
    key = jax.random.PRNGKey(2)
    us = np.asarray(haar_rand_unitary(key, 2, batch=(20000,)))
    rho = np.array([[1, 0], [0, 0]], dtype=complex)
    avg = np.einsum("nij,jk,nlk->il", us, rho, us.conj()) / len(us)
    assert np.max(np.abs(avg - np.eye(2) / 2)) < 0.02


def test_haar_second_moment():
    # E[|u_00|^4] = 2/(d(d+1)) for Haar measure
    key = jax.random.PRNGKey(3)
    d = 2
    us = np.asarray(haar_rand_unitary(key, d, batch=(20000,)))
    est = np.mean(np.abs(us[:, 0, 0]) ** 4)
    assert abs(est - 2 / (d * (d + 1))) < 0.01


def test_haar_state_normalized():
    key = jax.random.PRNGKey(4)
    psi = np.asarray(haar_rand_state(key, 8, batch=(100,)))
    norms = np.sum(np.abs(psi) ** 2, axis=(1, 2))
    assert np.allclose(norms, 1.0, atol=1e-12)


@pytest.mark.parametrize("rank", [1, 2])
def test_ginibre_state_matrix_valid(rank):
    key = jax.random.PRNGKey(5)
    rho = np.asarray(ginibre_state_matrix(key, 2, rank, batch=(50,)))
    assert np.allclose(np.trace(rho, axis1=1, axis2=2), 1.0, atol=1e-12)
    evals = np.linalg.eigvalsh(rho)
    assert evals.min() > -1e-12
    if rank == 1:
        # rank-1 states are pure
        assert np.allclose(np.sort(evals, axis=1)[:, :-1], 0.0, atol=1e-10)


def test_ginibre_rank_exceeds_dim_raises():
    with pytest.raises(ValueError):
        ginibre_state_matrix(jax.random.PRNGKey(0), 2, 3)


def test_bures_state_valid():
    key = jax.random.PRNGKey(6)
    rho = np.asarray(bures_measure_state_matrix(key, 2, batch=(50,)))
    assert np.allclose(np.trace(rho, axis1=1, axis2=2), 1.0, atol=1e-12)
    assert np.linalg.eigvalsh(rho).min() > -1e-12


def test_bcsz_is_cptp():
    key = jax.random.PRNGKey(7)
    for dim, rank in [(2, 1), (2, 4), (4, 4)]:
        choi = np.asarray(rand_map_with_BCSZ_dist(key, dim, rank))
        assert choi_is_completely_positive(choi, atol=1e-9)
        assert choi_is_trace_preserving(choi, atol=1e-9)


def test_permute_tensor_factors_swap():
    swap = permute_tensor_factors(2, [1, 0])
    # SWAP gate truth table
    expected = np.array([[1, 0, 0, 0],
                         [0, 0, 1, 0],
                         [0, 1, 0, 0],
                         [0, 0, 0, 1]], dtype=float)
    assert np.allclose(swap, expected)


def test_permute_tensor_factors_action():
    # check P(v0 x v1 x v2) = v_perm for a 3-cycle
    rng = np.random.RandomState(0)
    vs = [rng.randn(2) for _ in range(3)]
    perm = [2, 0, 1]
    p = permute_tensor_factors(2, perm)
    lhs = p @ np.kron(np.kron(vs[0], vs[1]), vs[2])
    rhs = np.kron(np.kron(vs[perm[0]], vs[perm[1]]), vs[perm[2]])
    assert np.allclose(lhs, rhs)


def test_permute_tensor_factors_mixed_dims():
    rng = np.random.RandomState(1)
    a, b = rng.randn(2), rng.randn(4)
    p = permute_tensor_factors([2, 4], [1, 0])
    assert np.allclose(p @ np.kron(a, b), np.kron(b, a))
