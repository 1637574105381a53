"""Applying superoperators (Kraus sets / Choi matrices) to states, batched.

Reference parity: forest/benchmarking/operator_tools/apply_superoperator.py
(apply_kraus_ops_2_state:33, apply_choi_matrix_2_state:60).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops.calculational import kron, partial_trace
from forest_benchmarking_tpu.ops.superoperator_transformations import _stack_kraus

__all__ = ["apply_kraus_ops_2_state", "apply_choi_matrix_2_state"]


def apply_kraus_ops_2_state(kraus_ops, state: jnp.ndarray) -> jnp.ndarray:
    r"""Apply a channel in Kraus form to a (batched) density matrix.

    ``rho_out = sum_i K_i rho K_i^dag``; Kraus operators may be non-square
    (..., K, rows, dim) applied to (..., dim, dim) giving (..., rows, rows).
    """
    k = _stack_kraus(kraus_ops)
    state = jnp.asarray(state)
    if state.shape[-1] != k.shape[-1]:
        raise ValueError("Dimensions of state and Kraus operator are incompatible")
    return jnp.einsum("...nij,...jk,...nlk->...il", k, state, jnp.conj(k),
                      precision=jax.lax.Precision.HIGHEST)


def apply_choi_matrix_2_state(choi: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    r"""Apply a channel in Choi form (column stacking) to a (batched) density matrix.

    ``rho_out = Tr_in[(rho^T otimes I) choi]``.
    """
    choi = jnp.asarray(choi)
    state = jnp.asarray(state)
    dim = int(np.sqrt(choi.shape[-1]))
    eye = jnp.eye(dim, dtype=choi.dtype)
    tot = jnp.matmul(kron(jnp.swapaxes(state, -1, -2), eye), choi, precision=jax.lax.Precision.HIGHEST)
    return partial_trace(tot, keep=[1], dims=[dim, dim])
