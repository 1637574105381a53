"""Channel approximations.

Reference parity: forest/benchmarking/operator_tools/channel_approximation.py
(pauli_twirl_chi_matrix:31).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pauli_twirl_chi_matrix"]


def pauli_twirl_chi_matrix(chi_matrix: jnp.ndarray) -> jnp.ndarray:
    """Pauli twirl of a (batched) chi matrix: keep only the diagonal [SPICC]."""
    chi_matrix = jnp.asarray(chi_matrix)
    diag = jnp.diagonal(chi_matrix, axis1=-2, axis2=-1)
    d = chi_matrix.shape[-1]
    return diag[..., None, :] * jnp.eye(d, dtype=chi_matrix.dtype)
