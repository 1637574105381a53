"""Projection of a Hermitian matrix onto the set of physical density matrices.

Reference parity: forest/benchmarking/operator_tools/project_state_matrix.py:6
("wizard" method of Smolin et al., https://arxiv.org/abs/1106.5458).

TPU-first design: the reference's sequential eigenvalue waterfilling loop is
replaced by a branchless cumulative-sum formulation so that the projection is a
single batched eigh + elementwise ops -- fully jit/vmap-safe with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops.calculational import dag

__all__ = ["project_state_matrix_to_physical"]


def project_state_matrix_to_physical(rho: jnp.ndarray) -> jnp.ndarray:
    """Project (batched) ``rho`` to the closest trace-1 PSD matrix in 2-norm.

    Algorithm (Smolin et al.): rescale to trace 1, eigendecompose, then zero out
    the most-negative eigenvalues while distributing their mass uniformly over
    the remaining ones, choosing the largest support for which all kept
    eigenvalues stay non-negative.

    Branchless equivalence to the reference's while-loop: with eigenvalues
    sorted descending, the loop zeroes the suffix j > i* where i* is the largest
    count i such that ``lam_i + (S - C_i) / i >= 0`` (C_i = prefix sum, S = total).

    :param rho: (..., d, d) Hermitian matrix (need not be PSD or trace 1).
    :return: (..., d, d) closest density matrix.
    """
    rho = jnp.asarray(rho)
    d = rho.shape[-1]
    tr = jnp.trace(rho, axis1=-2, axis2=-1)[..., None, None]
    rho = rho / tr

    eigvals, eigvecs = jnp.linalg.eigh(rho)  # ascending
    lam = eigvals[..., ::-1]  # descending
    csum = jnp.cumsum(lam, axis=-1)
    total = csum[..., -1:]
    counts = jnp.arange(1, d + 1, dtype=lam.dtype)
    # correction if we keep the first i eigenvalues: spread the removed mass
    corr = (total - csum) / counts
    keep_ok = lam + corr >= 0
    # keep_ok is monotone "prefix true" in exact arithmetic; pick the last True
    idx = jnp.sum(keep_ok.astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, d - 1)
    corr_star = jnp.take_along_axis(corr, idx[..., None], axis=-1)
    mask = counts <= (idx[..., None] + 1)
    lam_new = jnp.where(mask, lam + corr_star, 0.0)
    lam_new = lam_new[..., ::-1]  # back to ascending, matching eigvecs order
    return jnp.matmul(eigvecs * lam_new[..., None, :].astype(eigvecs.dtype),
                      dag(eigvecs), precision=jax.lax.Precision.HIGHEST)
