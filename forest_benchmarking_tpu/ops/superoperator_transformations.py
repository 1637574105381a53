"""Conversions between representations of superoperators (column-stacking convention).

Reference parity: forest/benchmarking/operator_tools/superoperator_transformations.py
(vec:33, unvec:54, kraus2chi:82, kraus2superop:100, kraus2pauli_liouville:148,
kraus2choi:159, chi2*:185-226, superop2*:229-277, pauli_liouville2*:280-322,
choi2kraus:325, choi2chi:339, choi2superop:351, choi2pauli_liouville:364,
pauli2computational_basis_matrix:374, computational2pauli_basis_matrix:411).

TPU-first design decisions:
  - All conversions accept arbitrary leading batch dims; they compile to reshapes,
    transposes and batched matmuls (MXU-friendly), never Python loops over Kraus ops.
  - Kraus sets are stacked arrays of shape (..., n_kraus, r, c), not Python lists.
  - The Pauli<->computational change-of-basis matrices are host-side cached numpy
    constants (they only depend on the dimension).
  - chi conversions use the direct congruence ``chi = c2p @ choi @ c2p^dag`` rather
    than the reference's eigendecomposition round-trip through Kraus operators;
    the results agree because the congruence commutes with the Kraus sum.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.utils import pauli_basis_matrices
from forest_benchmarking_tpu.ops.calculational import dag

__all__ = [
    "vec", "unvec",
    "kraus2chi", "kraus2superop", "kraus2pauli_liouville", "kraus2choi",
    "chi2pauli_liouville", "chi2kraus", "chi2superop", "chi2choi",
    "superop2kraus", "superop2chi", "superop2pauli_liouville", "superop2choi",
    "pauli_liouville2kraus", "pauli_liouville2chi", "pauli_liouville2superop",
    "pauli_liouville2choi",
    "choi2kraus", "choi2chi", "choi2superop", "choi2pauli_liouville",
    "pauli2computational_basis_matrix", "computational2pauli_basis_matrix",
]


def vec(matrix: jnp.ndarray) -> jnp.ndarray:
    """Vectorize a (..., N, M) matrix by column stacking -> (..., N*M, 1)."""
    matrix = jnp.asarray(matrix)
    t = jnp.swapaxes(matrix, -1, -2)
    return t.reshape(*t.shape[:-2], -1, 1)


def unvec(vector: jnp.ndarray, shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Invert :func:`vec`: (..., N*M, 1) or (..., N*M) -> (..., N, M) column-stacked."""
    vector = jnp.asarray(vector)
    if vector.shape[-1] == 1 and vector.ndim >= 2:
        vector = vector[..., 0]
    size = vector.shape[-1]
    if shape is None:
        dim = int(np.sqrt(size))
        if dim * dim != size:
            raise ValueError(f"{size} is not a perfect square; pass `shape`.")
        shape = (dim, dim)
    n, m = shape
    return jnp.swapaxes(vector.reshape(*vector.shape[:-1], m, n), -1, -2)


def _stack_kraus(kraus_ops) -> jnp.ndarray:
    """Normalize input to a stacked (..., K, r, c) array."""
    if isinstance(kraus_ops, (list, tuple)):
        return jnp.stack([jnp.asarray(k) for k in kraus_ops], axis=-3)
    arr = jnp.asarray(kraus_ops)
    if arr.ndim == 2:  # single Kraus op
        arr = arr[None]
    return arr


@functools.lru_cache(maxsize=None)
def _p2c_np(dim: int) -> np.ndarray:
    """Host-side cached pauli->computational basis transform (dim**2 x dim**2)."""
    n_qubits = int(np.log2(dim))
    paulis = pauli_basis_matrices(n_qubits)  # (dim**2, dim, dim)
    # column k is vec(P_k) (column stacking)
    return np.swapaxes(paulis, -1, -2).reshape(dim * dim, dim * dim).T.copy()


def pauli2computational_basis_matrix(dim: int) -> jnp.ndarray:
    r"""Matrix sending unnormalized-Pauli-basis coordinates to vec'd matrices.

    ``p2c @ e_k = vec(sigma_k)`` (reference superoperator_transformations.py:374).
    """
    return jnp.asarray(_p2c_np(dim))


def computational2pauli_basis_matrix(dim: int) -> jnp.ndarray:
    r"""Inverse transform: ``c2p = p2c^dag / dim`` (reference :411)."""
    return jnp.asarray(_p2c_np(dim).conj().T / dim)


# ------------------------------------------------------------------ kraus -> *

def kraus2superop(kraus_ops) -> jnp.ndarray:
    r"""Kraus -> superoperator: :math:`\sum_i \bar K_i \otimes K_i` (column stacking).

    Accepts non-square Kraus operators: (..., K, r, c) -> (..., r**2, c**2).
    """
    k = _stack_kraus(kraus_ops)
    r, c = k.shape[-2:]
    out = jnp.einsum("...nij,...nkl->...ikjl", jnp.conj(k), k, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*out.shape[:-4], r * r, c * c)


def kraus2choi(kraus_ops) -> jnp.ndarray:
    r"""Kraus -> Choi: :math:`\sum_i |K_i\rangle\rangle \langle\langle K_i|`."""
    k = _stack_kraus(kraus_ops)
    v = vec(k)[..., 0]  # (..., K, r*c)
    return jnp.einsum("...na,...nb->...ab", v, jnp.conj(v), precision=jax.lax.Precision.HIGHEST)


def kraus2chi(kraus_ops) -> jnp.ndarray:
    """Kraus -> chi (process) matrix: c_i = c2p |K_i>>, chi = sum c c^dag."""
    k = _stack_kraus(kraus_ops)
    dim = k.shape[-1]
    c2p = computational2pauli_basis_matrix(dim).astype(k.dtype)
    c = jnp.einsum("ab,...nb->...na", c2p, vec(k)[..., 0], precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...na,...nb->...ab", c, jnp.conj(c), precision=jax.lax.Precision.HIGHEST)


def kraus2pauli_liouville(kraus_ops) -> jnp.ndarray:
    """Kraus -> Pauli-Liouville (Pauli transfer matrix)."""
    return superop2pauli_liouville(kraus2superop(kraus_ops))


# ------------------------------------------------------------------ chi -> *

def chi2choi(chi_matrix: jnp.ndarray) -> jnp.ndarray:
    """chi -> Choi: congruence by the pauli->computational transform."""
    chi_matrix = jnp.asarray(chi_matrix)
    dim = int(np.sqrt(chi_matrix.shape[-1]))
    p2c = pauli2computational_basis_matrix(dim).astype(chi_matrix.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(p2c, chi_matrix, precision=hi), dag(p2c),
                      precision=hi)


def chi2pauli_liouville(chi_matrix: jnp.ndarray) -> jnp.ndarray:
    return choi2pauli_liouville(chi2choi(chi_matrix))


def chi2superop(chi_matrix: jnp.ndarray) -> jnp.ndarray:
    return choi2superop(chi2choi(chi_matrix))


def chi2kraus(chi_matrix: jnp.ndarray) -> List[jnp.ndarray]:
    """chi -> list of Kraus operators (host-side; eigendecomposition + tol filter)."""
    return choi2kraus(chi2choi(chi_matrix))


# ------------------------------------------------------------------ superop -> *

def superop2choi(superop: jnp.ndarray) -> jnp.ndarray:
    """Superoperator -> Choi (involution: reshape/swap of tensor factors)."""
    superop = jnp.asarray(superop)
    dim = int(np.sqrt(superop.shape[-1]))
    batch = superop.shape[:-2]
    t = superop.reshape(*batch, dim, dim, dim, dim)
    t = jnp.swapaxes(t, -4, -1)
    return t.reshape(*batch, dim * dim, dim * dim)


def superop2pauli_liouville(superop: jnp.ndarray) -> jnp.ndarray:
    """Superoperator -> Pauli-Liouville: ``c2p @ S @ c2p^dag * dim``."""
    superop = jnp.asarray(superop)
    dim = int(np.sqrt(superop.shape[-1]))
    c2p = computational2pauli_basis_matrix(dim).astype(superop.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(c2p, superop, precision=hi), dag(c2p),
                      precision=hi) * dim


def superop2kraus(superop: jnp.ndarray) -> List[jnp.ndarray]:
    return choi2kraus(superop2choi(superop))


def superop2chi(superop: jnp.ndarray) -> jnp.ndarray:
    return kraus2chi(jnp.stack(superop2kraus(superop), axis=-3))


# ------------------------------------------------------------------ PL -> *

def pauli_liouville2superop(pl_matrix: jnp.ndarray) -> jnp.ndarray:
    """Pauli-Liouville -> superoperator: ``p2c @ R @ p2c^dag / dim``."""
    pl_matrix = jnp.asarray(pl_matrix)
    dim = int(np.sqrt(pl_matrix.shape[-1]))
    p2c = pauli2computational_basis_matrix(dim).astype(pl_matrix.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(p2c, pl_matrix, precision=hi), dag(p2c),
                      precision=hi) / dim


def pauli_liouville2choi(pl_matrix: jnp.ndarray) -> jnp.ndarray:
    return superop2choi(pauli_liouville2superop(pl_matrix))


def pauli_liouville2kraus(pl_matrix: jnp.ndarray) -> List[jnp.ndarray]:
    return choi2kraus(pauli_liouville2choi(pl_matrix))


def pauli_liouville2chi(pl_matrix: jnp.ndarray) -> jnp.ndarray:
    return kraus2chi(jnp.stack(pauli_liouville2kraus(pl_matrix), axis=-3))


# ------------------------------------------------------------------ choi -> *

def choi2superop(choi: jnp.ndarray) -> jnp.ndarray:
    """Choi -> superoperator (same involution as :func:`superop2choi`)."""
    return superop2choi(choi)


def choi2pauli_liouville(choi: jnp.ndarray) -> jnp.ndarray:
    return superop2pauli_liouville(choi2superop(choi))


def choi2chi(choi: jnp.ndarray) -> jnp.ndarray:
    """Choi -> chi by direct congruence with c2p (equivalent to the reference's
    round trip through Kraus operators, without the eigendecomposition)."""
    choi = jnp.asarray(choi)
    dim = int(np.sqrt(choi.shape[-1]))
    c2p = computational2pauli_basis_matrix(dim).astype(choi.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(c2p, choi, precision=hi), dag(c2p),
                      precision=hi)


def choi2kraus(choi, tol: float = None) -> List[np.ndarray]:
    """Choi -> list of Kraus operators, dropping eigenvalues with |lambda| <= tol.

    Host-side (plain numpy — safe to call in a TPU process, where complex
    device buffers cannot cross to the host): the number of returned operators
    is data-dependent. For a jittable fixed-size variant keep the full stack
    from eigh yourself.

    ``tol`` defaults to the larger of the reference's 1e-9 and a dtype-aware
    floor ``10 d eps |lambda|_max`` — in float32, eigh noise on a
    rank-deficient Choi is ~1e-6 relative, so the fixed 1e-9 would emit up to
    d^2 spurious operators for every unitary channel on the f32/c64 path.
    """
    choi = np.asarray(choi)
    if choi.ndim != 2:
        raise ValueError("choi2kraus is host-side and unbatched; vmap-unsafe by design.")
    eigvals, v = np.linalg.eigh(choi)
    if tol is None:
        tol = max(1e-9, 10 * choi.shape[-1] * np.finfo(eigvals.dtype).eps
                  * float(np.max(np.abs(eigvals), initial=0.0)))
    d = int(np.sqrt(choi.shape[-1]))
    # mirror np.lib.scimath.sqrt: negative eigenvalues give imaginary coefficients
    kraus = []
    for lam, evec in zip(eigvals, v.T):
        if abs(lam) > tol:
            coeff = np.sqrt(lam) if lam >= 0 else 1j * np.sqrt(-lam)
            kraus.append(coeff * evec.reshape(d, d).T)  # numpy unvec
    return kraus
