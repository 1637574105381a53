"""Random quantum states and processes with explicit JAX PRNG keys.

Reference parity: forest/benchmarking/operator_tools/random_operators.py
(ginibre_matrix_complex:21, haar_rand_unitary:49, haar_rand_state:75,
ginibre_state_matrix:90, bures_measure_state_matrix:110,
rand_map_with_BCSZ_dist:133, permute_tensor_factors:160).

TPU-first design: every sampler takes a ``jax.random`` key as its first argument
(instead of a mutable numpy RandomState) and supports a ``batch`` shape so whole
ensembles are drawn in one XLA dispatch.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops.calculational import dag, kron, partial_trace

__all__ = [
    "ginibre_matrix_complex", "haar_rand_unitary", "haar_rand_state",
    "ginibre_state_matrix", "bures_measure_state_matrix", "rand_map_with_BCSZ_dist",
    "permute_tensor_factors",
]


def _mm(*mats):
    """Chained matmul at full precision (TPU bf16 default corrupts samples)."""
    out = mats[0]
    for m in mats[1:]:
        out = jnp.matmul(out, m, precision=jax.lax.Precision.HIGHEST)
    return out

def ginibre_matrix_complex(key, dim: int, k: int, batch: Tuple[int, ...] = (),
                           dtype=jnp.float64) -> jnp.ndarray:
    r"""Draw a (batched) dim-by-k matrix from the complex Ginibre ensemble.

    Each element is ``N(0,1) + 1j N(0,1)`` [IM].
    """
    kre, kim = jax.random.split(key)
    re = jax.random.normal(kre, (*batch, dim, k), dtype=dtype)
    im = jax.random.normal(kim, (*batch, dim, k), dtype=dtype)
    return re + 1j * im


def haar_rand_unitary(key, dim: int, batch: Tuple[int, ...] = (),
                      dtype=jnp.float64) -> jnp.ndarray:
    """Draw a (batched) Haar-random unitary via QR with phase fixing [MEZ]."""
    z = ginibre_matrix_complex(key, dim, dim, batch, dtype)
    q, r = jnp.linalg.qr(z)
    diag = jnp.diagonal(r, axis1=-2, axis2=-1)
    lamb = diag / jnp.abs(diag)
    return q * lamb[..., None, :]


def haar_rand_state(key, dim: int, batch: Tuple[int, ...] = (),
                    dtype=jnp.float64) -> jnp.ndarray:
    """Draw a (batched) Haar-random pure state as a (..., dim, 1) column vector."""
    u = haar_rand_unitary(key, dim, batch, dtype)
    return u[..., :, :1]


def ginibre_state_matrix(key, dim: int, rank: int, batch: Tuple[int, ...] = (),
                         dtype=jnp.float64) -> jnp.ndarray:
    """Draw a (batched) rank-``rank`` density matrix from the induced Ginibre measure.

    For rank == dim this is the Hilbert-Schmidt measure [IM].
    """
    if rank > dim:
        raise ValueError("The rank of the state matrix cannot exceed the dimension.")
    a = ginibre_matrix_complex(key, dim, rank, batch, dtype)
    m = _mm(a, dag(a))
    tr = jnp.trace(m, axis1=-2, axis2=-1)[..., None, None]
    return m / tr


def bures_measure_state_matrix(key, dim: int, batch: Tuple[int, ...] = (),
                               dtype=jnp.float64) -> jnp.ndarray:
    """Draw a (batched) density matrix from the Bures measure [OSZ]."""
    ka, ku = jax.random.split(key)
    a = ginibre_matrix_complex(ka, dim, dim, batch, dtype)
    u = haar_rand_unitary(ku, dim, batch, dtype)
    eye = jnp.eye(dim, dtype=a.dtype)
    m = _mm(a, dag(a))
    p = _mm(eye + u, m, eye + dag(u))
    tr = jnp.trace(p, axis1=-2, axis2=-1)[..., None, None]
    return p / tr


def rand_map_with_BCSZ_dist(key, dim: int, kraus_rank: int,
                            batch: Tuple[int, ...] = (),
                            dtype=jnp.float64) -> jnp.ndarray:
    """Draw a (batched) CPTP Choi matrix from the BCSZ distribution [RQO].

    Column-stacking convention: the normalizer acts as ``kron(W, I)`` with
    ``W = (Tr_out rho)^{-1/2}`` (reference random_operators.py:148-157).
    """
    x = ginibre_matrix_complex(key, dim ** 2, kraus_rank, batch, dtype)
    rho = _mm(x, dag(x))
    rho_red = partial_trace(rho, keep=[0], dims=[dim, dim])
    # inverse PSD sqrt via eigh (rho_red is positive definite almost surely)
    w, v = jnp.linalg.eigh(rho_red)
    inv_sqrt = _mm(v * (1.0 / jnp.sqrt(w))[..., None, :].astype(v.dtype),
                   dag(v))
    q = kron(inv_sqrt, jnp.eye(dim, dtype=rho.dtype))
    return _mm(q, rho, q)


def permute_tensor_factors(dims: Union[int, List[int]], perm: Sequence[int]) -> np.ndarray:
    r"""Permutation matrix that reorders tensor factors (host-side constant).

    ``P (v_0 x v_1 x ... ) = v_{perm[0]} x v_{perm[1]} x ...`` on spaces of the
    given dimension(s); see eq. 5.11-5.13 of [SCOTT].
    """
    perm = list(perm)
    if isinstance(dims, int):
        dim_list = [dims] * len(perm)
    else:
        assert len(dims) == len(perm), "Specify the dimension of each factor."
        dim_list = list(dims)
    total_dim = int(np.prod(dim_list))
    eye = np.eye(total_dim).reshape(dim_list + dim_list)
    # move row factor i to position of factor perm[i]
    src = list(range(len(perm)))
    eye = np.moveaxis(eye, perm, src)
    return eye.reshape(total_dim, total_dim)
