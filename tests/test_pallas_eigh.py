"""Jacobi CP-projection kernel: correctness vs eigh (cpu path of the kernel)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.ops.pallas_eigh import (
    cp_project_pallas, jacobi_eigh_reference, round_robin_pairs)
from forest_benchmarking_tpu.ops import proj_choi_to_completely_positive


def test_round_robin_covers_all_pairs():
    rounds = round_robin_pairs(16)
    assert len(rounds) == 15
    seen = set()
    for pairs in rounds:
        assert len(pairs) == 8
        flat = [q for pr in pairs for q in pr]
        assert len(set(flat)) == 16  # disjoint within a round
        seen.update(pairs)
    assert len(seen) == 16 * 15 // 2


def test_jacobi_pos_part_matches_eigh():
    rng = np.random.RandomState(0)
    for _ in range(5):
        b = rng.randn(16, 16) + 1j * rng.randn(16, 16)
        h = (b + b.conj().T) / 2
        ours = jacobi_eigh_reference(h, sweeps=8)
        exact = np.asarray(proj_choi_to_completely_positive(jnp.asarray(h)))
        assert np.max(np.abs(ours - exact)) < 1e-10


@pytest.mark.slow
def test_cp_project_batched_matches_eigh():
    rng = np.random.RandomState(1)
    bmats = rng.randn(8, 16, 16) + 1j * rng.randn(8, 16, 16)
    h = (bmats + bmats.conj().transpose(0, 2, 1)) / 2
    ours = np.asarray(cp_project_pallas(jnp.asarray(h), sweeps=8,
                                        use_pallas=False))
    exact = np.asarray(proj_choi_to_completely_positive(jnp.asarray(h)))
    assert np.max(np.abs(ours - exact)) < 1e-10


@pytest.mark.slow
def test_cp_project_f32_quality():
    rng = np.random.RandomState(2)
    bmats = rng.randn(8, 16, 16) + 1j * rng.randn(8, 16, 16)
    h = ((bmats + bmats.conj().transpose(0, 2, 1)) / 2).astype(np.complex64)
    ours = np.asarray(cp_project_pallas(jnp.asarray(h), sweeps=6,
                                        use_pallas=False))
    exact = np.asarray(proj_choi_to_completely_positive(
        jnp.asarray(h.astype(np.complex128))))
    assert np.max(np.abs(ours - exact)) < 1e-4
