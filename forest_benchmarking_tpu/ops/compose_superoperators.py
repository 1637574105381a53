"""Tensoring and composing channels given as Kraus sets, batched.

Reference parity: forest/benchmarking/operator_tools/compose_superoperators.py
(tensor_channel_kraus:7, compose_channel_kraus:31).

Kraus sets are stacked arrays (..., K, r, c); outputs are stacked arrays whose
Kraus index enumerates all combinatorial pairs, matching the reference's list
comprehension order (k1 index varies slowest... see notes in each function).
"""
from __future__ import annotations

import jax.numpy as jnp

from forest_benchmarking_tpu.ops.calculational import kron
from forest_benchmarking_tpu.ops.superoperator_transformations import _stack_kraus

__all__ = ["tensor_channel_kraus", "compose_channel_kraus"]


def tensor_channel_kraus(k2, k1) -> jnp.ndarray:
    r"""Kraus set of the tensor channel ``E2 (x) E1`` on ``H_2 (x) H_1``.

    Matches the reference ordering ``[kron(k2l, k1j) for k1j in k1 for k2l in k2]``:
    the k1 index varies slowest.
    """
    a2 = _stack_kraus(k2)
    a1 = _stack_kraus(k1)
    out = kron(a2[..., None, :, :, :], a1[..., :, None, :, :])  # (..., K1, K2, r, c)
    return out.reshape(*out.shape[:-4], -1, *out.shape[-2:])


def compose_channel_kraus(k2, k1) -> jnp.ndarray:
    """Kraus set of the composition (k1 applied first, then k2)."""
    a2 = _stack_kraus(k2)
    a1 = _stack_kraus(k1)
    out = a2[..., None, :, :, :] @ a1[..., :, None, :, :]  # (..., K1, K2, r, c)
    return out.reshape(*out.shape[:-4], -1, *out.shape[-2:])
