"""Predicates checking properties of operators/matrices.

Reference parity: forest/benchmarking/operator_tools/validate_operator.py:6-150.

These are tolerance predicates returning Python bools for single matrices
(host-side; they are cheap and not on the hot path). Tolerances match
``np.allclose`` defaults like the reference.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "is_square_matrix", "is_symmetric_matrix", "is_identity_matrix",
    "is_idempotent_matrix", "is_normal_matrix", "is_hermitian_matrix",
    "is_unitary_matrix", "is_positive_definite_matrix",
    "is_positive_semidefinite_matrix",
]


def _np(matrix) -> np.ndarray:
    return np.asarray(matrix)


def is_square_matrix(matrix) -> bool:
    """True iff the matrix is square."""
    matrix = _np(matrix)
    if matrix.ndim != 2:
        raise ValueError("The object is not a matrix.")
    rows, cols = matrix.shape
    return rows == cols


def is_symmetric_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A == A^T within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    return bool(np.allclose(matrix, matrix.T, rtol=rtol, atol=atol))


def is_identity_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A == I within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    return bool(np.allclose(matrix, np.eye(len(matrix)), rtol=rtol, atol=atol))


def is_idempotent_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A @ A == A within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    return bool(np.allclose(matrix, matrix @ matrix, rtol=rtol, atol=atol))


def is_normal_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A^dag A == A A^dag within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    ab = matrix.T.conj() @ matrix
    ba = matrix @ matrix.T.conj()
    return bool(np.allclose(ab, ba, rtol=rtol, atol=atol))


def is_hermitian_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A == A^dag within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    return bool(np.allclose(matrix, matrix.T.conj(), rtol=rtol, atol=atol))


def is_unitary_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff A^dag A == A A^dag == I within tolerance."""
    matrix = _np(matrix)
    if not is_square_matrix(matrix):
        raise ValueError("The matrix is not square.")
    eye = np.eye(len(matrix))
    return bool(np.allclose(matrix.T.conj() @ matrix, eye, rtol=rtol, atol=atol)
                and np.allclose(matrix @ matrix.T.conj(), eye, rtol=rtol, atol=atol))


def is_positive_definite_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff Hermitian A has all eigenvalues > -|atol|."""
    matrix = _np(matrix)
    if not is_hermitian_matrix(matrix, rtol, atol):
        raise ValueError("The matrix is not Hermitian.")
    evals = np.linalg.eigvalsh(matrix)
    return bool(np.all(evals > -abs(atol)))


def is_positive_semidefinite_matrix(matrix, rtol: float = 1e-05, atol: float = 1e-08) -> bool:
    """True iff Hermitian A has all eigenvalues >= -|atol|."""
    matrix = _np(matrix)
    if not is_hermitian_matrix(matrix, rtol, atol):
        raise ValueError("The matrix is not Hermitian.")
    evals = np.linalg.eigvalsh(matrix)
    return bool(np.all(evals >= -abs(atol)))
