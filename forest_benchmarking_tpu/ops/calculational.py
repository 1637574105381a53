"""Batched calculational helpers: partial trace, inner/outer products, PSD sqrt, kron.

Reference parity: forest/benchmarking/operator_tools/calculational.py
(partial_trace:5, outer_product:38, inner_product:55, sqrtm_psd:77).

TPU-first design: every function accepts arbitrary leading batch dimensions and is
jit/vmap-safe; ``jnp.linalg.eigh`` batches over small Hermitian matrices in one
XLA dispatch, which is the hot pattern throughout this library.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["partial_trace", "outer_product", "inner_product", "sqrtm_psd", "kron",
           "dag", "hermitianize"]


def dag(a: jnp.ndarray) -> jnp.ndarray:
    """Conjugate transpose over the trailing two axes."""
    return jnp.conj(jnp.swapaxes(a, -1, -2))


def hermitianize(a: jnp.ndarray) -> jnp.ndarray:
    """(A + A^dagger) / 2 over the trailing two axes."""
    return (a + dag(a)) / 2


def kron(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product over the trailing two axes, broadcasting batch dims.

    ``kron(A, B)[..., i*p + k, j*q + l] = A[..., i, j] * B[..., k, l]``
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    r1, c1 = a.shape[-2:]
    r2, c2 = b.shape[-2:]
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(*out.shape[:-4], r1 * r2, c1 * c2)


def partial_trace(rho: jnp.ndarray, keep: Sequence[int], dims: Sequence[int]) -> jnp.ndarray:
    """Partial trace of a (batched) matrix over the factors not in ``keep``.

    :param rho: (..., D, D) matrix on the product space with D = prod(dims).
    :param keep: static indices of the tensor factors to keep.
    :param dims: static dimensions of each tensor factor.
    :return: (..., Dk, Dk) with Dk = prod(dims[i] for i in keep).
    """
    rho = jnp.asarray(rho)
    keep = tuple(keep)
    dims = tuple(dims)
    n = len(dims)
    batch_shape = rho.shape[:-2]
    nb = len(batch_shape)
    rho = rho.reshape(*batch_shape, *dims, *dims)
    # contract row/col axes of every traced factor
    traced = [i for i in range(n) if i not in keep]
    for count, i in enumerate(sorted(traced)):
        # after `count` traces, factor i sits at axis nb + (i - count); its column
        # partner sits n - count factors later
        ax = nb + i - count
        rho = jnp.trace(rho, axis1=ax, axis2=ax + (n - count))
    dk = 1
    for i in keep:
        dk *= dims[i]
    return rho.reshape(*batch_shape, dk, dk)


def outer_product(bra1: jnp.ndarray, bra2: jnp.ndarray) -> jnp.ndarray:
    """|bra1><bra2| for (..., d, 1) column vectors."""
    return jnp.matmul(bra1, dag(bra2), precision=jax.lax.Precision.HIGHEST)


def inner_product(bra1: jnp.ndarray, bra2: jnp.ndarray) -> jnp.ndarray:
    """<bra1|bra2> for (..., d, 1) column vectors; returns (..., 1, 1)."""
    return jnp.matmul(dag(bra1), bra2, precision=jax.lax.Precision.HIGHEST)


def sqrtm_psd(matrix: jnp.ndarray) -> jnp.ndarray:
    """Square root of a (batched) positive semidefinite matrix via eigh.

    Negative eigenvalues from floating-point noise are clipped to zero, matching
    the reference (calculational.py:77). Additionally, eigenvalues below
    ``d * eps * lambda_max`` (pure eigh noise on rank-deficient inputs) are
    clipped: the square root amplifies them from ~eps to ~sqrt(eps), which at
    f32 costs 1e-3 in quantities like the Uhlmann fidelity of pure states.
    """
    w, v = jnp.linalg.eigh(matrix)
    d = matrix.shape[-1]
    eps = jnp.finfo(jnp.real(matrix).dtype).eps
    floor = d * eps * jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    w = jnp.sqrt(jnp.where(w < floor, 0.0, w))
    # full-precision reconstruction (TPU bf16 default costs ~1e-3)
    return jnp.matmul(v * w[..., None, :], dag(v), precision=jax.lax.Precision.HIGHEST)
