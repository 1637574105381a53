"""Predicates checking physicality of channels/superoperators.

Reference parity: forest/benchmarking/operator_tools/validate_superoperator.py
(kraus_operators_are_valid:40, choi_is_hermitian_preserving:63,
choi_is_trace_preserving:78, choi_is_completely_positive:98, choi_is_cptp:114,
choi_is_unital:129, choi_is_unitary:147).
"""
from __future__ import annotations

import numpy as np

from forest_benchmarking_tpu.ops.validate_operator import (
    is_hermitian_matrix, is_identity_matrix, is_positive_semidefinite_matrix)

# NOTE: these predicates are deliberately plain numpy end to end. They are
# host-side analysis helpers; routing them through jnp would create eager
# complex device buffers on the default backend, which cannot be fetched
# back on the axon TPU tunnel (CLAUDE.md).

__all__ = [
    "kraus_operators_are_valid", "choi_is_hermitian_preserving",
    "choi_is_trace_preserving", "choi_is_completely_positive", "choi_is_cptp",
    "choi_is_unital", "choi_is_unitary",
]


def kraus_operators_are_valid(kraus_ops, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff the POVM elements K_i^dag K_i are PSD and sum to the identity."""
    kraus_ops = np.asarray(kraus_ops)
    k = kraus_ops[None] if kraus_ops.ndim == 2 else kraus_ops
    povm = np.einsum("nji,njk->nik", k.conj(), k)
    all_psd = all(is_positive_semidefinite_matrix(elem, rtol, atol) for elem in povm)
    return all_psd and is_identity_matrix(povm.sum(axis=0), rtol, atol)


def choi_is_hermitian_preserving(choi, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff the channel is Hermiticity-preserving (Choi is Hermitian)."""
    return is_hermitian_matrix(np.asarray(choi), rtol, atol)


def choi_is_trace_preserving(choi, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff Tr_out(choi) == I (eq. 3.33 of [GRAPTN])."""
    choi = np.asarray(choi)
    dim = int(np.sqrt(choi.shape[-1]))
    r = choi.reshape(dim, dim, dim, dim)
    pt = np.einsum("ikjk->ij", r)  # trace out H_out (second factor)
    return is_identity_matrix(pt, rtol, atol)


def choi_is_completely_positive(choi, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff the Choi matrix is PSD (eq. 3.35 of [GRAPTN])."""
    return is_positive_semidefinite_matrix(np.asarray(choi), rtol, atol)


def choi_is_cptp(choi, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff the channel is completely positive and trace-preserving."""
    return (choi_is_completely_positive(choi, rtol, atol)
            and choi_is_trace_preserving(choi, rtol, atol))


def choi_is_unital(choi, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff the channel maps the identity to itself."""
    choi = np.asarray(choi)
    dim = int(np.sqrt(choi.shape[-1]))
    r = choi.reshape(dim, dim, dim, dim)
    out = np.einsum("ikil->kl", r)  # E(I) = Tr_in(choi)
    return is_identity_matrix(out, rtol, atol)


def choi_is_unitary(choi, limit: float = None) -> bool:
    """True iff the channel has exactly one non-negligible Kraus operator.

    ``limit`` defaults to choi2kraus's dtype-aware eigenvalue floor (the
    reference's fixed 1e-9 misclassifies every unitary channel in float32,
    where eigh noise on the rank-1 Choi is ~1e-6).
    """
    from forest_benchmarking_tpu.ops.superoperator_transformations import (
        choi2kraus)
    return len(choi2kraus(choi, tol=limit)) == 1
