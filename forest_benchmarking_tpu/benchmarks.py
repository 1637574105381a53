"""Benchmark problem builders: synthetic tomography datasets, fully on-device.

Used by bench.py (the driver-run performance harness) and __graft_entry__.py.
Everything here keeps complex dtypes strictly inside jit (float/int I/O) so it
runs over the axon TPU tunnel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.paulis import pauli_term_to_matrix
from forest_benchmarking_tpu.tomography import (
    _pauli_process_tomo_settings, state_to_density)
from forest_benchmarking_tpu.ops.superoperator_transformations import vec
from forest_benchmarking_tpu.ops.random_operators import rand_map_with_BCSZ_dist

__all__ = ["process_tomo_A_matrix", "synth_process_datasets",
           "split_complex", "join_complex"]


def split_complex(x) -> np.ndarray:
    """Stack (real, imag) on a new leading axis — float-safe transport."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag]).astype(np.float32 if
                                             x.dtype == np.complex64 else np.float64)


def join_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split_complex (inside jit)."""
    return x[0] + 1j * x[1]


@functools.lru_cache(maxsize=None)
def process_tomo_A_matrix(n_qubits: int) -> np.ndarray:
    """The (R, d^4) PGDB A-matrix for full Pauli-basis process tomography.

    Row pairs are the +/- projector rows of eq. A1 of [PGD] for each
    (input eigenstate, observable) setting; p = A vec(choi) gives outcome
    probabilities. Host-cached; ship to device as split_complex.
    """
    from forest_benchmarking_tpu.tomography import pgdb_a_row_pair
    qubits = list(range(n_qubits))
    dim = 2 ** n_qubits
    eye = np.eye(dim)
    rows = []
    for setting in _pauli_process_tomo_settings(qubits):
        in_mat = state_to_density(setting.in_state, qubits)
        op = pauli_term_to_matrix(setting.observable.copy(coefficient=1.0), qubits)
        rows.extend(pgdb_a_row_pair(in_mat, op, eye))
    return np.stack(rows) / dim ** 2


def synth_process_datasets(key, a: jnp.ndarray, dim: int, batch: int,
                           shots: int, kraus_rank: int = None,
                           dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``batch`` random CPTP channels and simulated count data.

    Returns (n, true_chois): ``n`` is the (batch, R) normalized count vector fed
    to PGDB; ``true_chois`` the (batch, d^2, d^2) ground-truth Choi matrices
    (complex — keep on device).
    """
    if kraus_rank is None:
        kraus_rank = dim * dim
    kc, ks = jax.random.split(key)
    chois = rand_map_with_BCSZ_dist(kc, dim, kraus_rank, batch=(batch,),
                                    dtype=dtype)
    # ground-truth probabilities must not depend on the ambient matmul
    # precision config (TPU default is bf16 passes)
    p = jnp.real(jnp.einsum("ra,ba->br", a, vec(chois)[..., 0],
                            precision=jax.lax.Precision.HIGHEST))
    p = jnp.clip(p, 0.0, 1.0)
    pp = p[:, 0::2]
    pm = p[:, 1::2]
    bern = pp / jnp.clip(pp + pm, 1e-12, None)
    k = jax.random.binomial(ks, shots, bern).astype(p.dtype)
    counts = jnp.stack([k, shots - k], axis=-1).reshape(batch, -1)
    grand_total = shots * pp.shape[1]
    return counts / grand_total, chois
