"""Density-matrix simulation with Kraus-channel noise and readout confusion.

This is the noisy backend replacing the reference's QVM noise model path
(PRAGMA ADD-KRAUS / PRAGMA READOUT-POVM inheritance,
observable_estimation.py:945-951; define_noisy_gate in tests).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit

__all__ = ["run_density_matrix", "density_probabilities", "apply_confusion",
           "apply_gate_to_density", "apply_kraus_to_density", "decoherence_kraus"]


def _lift(mat: jnp.ndarray, axes: Sequence[int], n: int) -> jnp.ndarray:
    """Lift a k-qubit matrix to the full 2**n space given tensor axis positions."""
    k = len(axes)
    d = 2 ** n
    # build permutation placing `axes` first
    rest = [i for i in range(n) if i not in axes]
    perm = list(axes) + rest
    # P: basis reorder matrix implemented via reshape/transpose of an identity-free
    # approach: lift = perm^T (mat ⊗ I) perm acting on axes
    full = jnp.kron(mat, jnp.eye(2 ** (n - k), dtype=mat.dtype))
    t = full.reshape((2,) * (2 * n))
    inv = np.argsort(perm)
    t = jnp.transpose(t, list(inv) + [n + i for i in inv])
    return t.reshape(d, d)


def apply_gate_to_density(rho: jnp.ndarray, mat: jnp.ndarray,
                          axes: Sequence[int], n: int) -> jnp.ndarray:
    u = _lift(mat, axes, n)
    # full-precision matmuls: TPU's default bf16 passes compound ~1e-3 error
    # per gate across a circuit — never depend on the ambient precision config
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(u, rho, precision=hi), u.conj().T,
                      precision=hi)


def apply_kraus_to_density(rho: jnp.ndarray, kraus_stack: jnp.ndarray,
                           axes: Sequence[int], n: int) -> jnp.ndarray:
    out = jnp.zeros_like(rho)
    hi = jax.lax.Precision.HIGHEST
    for i in range(kraus_stack.shape[0]):
        k = _lift(kraus_stack[i], axes, n)
        out = out + jnp.matmul(jnp.matmul(k, rho, precision=hi), k.conj().T,
                               precision=hi)
    return out


def decoherence_kraus(duration: float, t1: Optional[float],
                      t2: Optional[float]) -> np.ndarray:
    """Kraus stack for idling ``duration`` with relaxation T1 and coherence T2.

    Amplitude damping gamma = 1 - exp(-t/T1) composed with pure dephasing
    chosen so off-diagonals decay as exp(-t/T2) overall (requires T2 <= 2 T1).
    """
    gamma = 0.0 if (t1 is None or t1 <= 0) else 1 - np.exp(-duration / t1)
    amp = [np.array([[1, 0], [0, np.sqrt(1 - gamma)]], dtype=complex)]
    if gamma > 0:  # gamma == 0 makes this operator identically zero
        amp.append(np.array([[0, np.sqrt(gamma)], [0, 0]], dtype=complex))
    ops = amp
    if t2 is not None and t2 > 0:
        half_t1_rate = 0.0 if (t1 is None or t1 <= 0) else 1 / (2 * t1)
        phi_rate = 1 / t2 - half_t1_rate
        lam = 1 - np.exp(-2 * duration * max(phi_rate, 0.0))
        deph = [np.diag([1, np.sqrt(1 - lam)]).astype(complex)]
        if lam > 0:
            deph.append(np.diag([0, np.sqrt(lam)]).astype(complex))
        ops = [d @ a for a in amp for d in deph]
    # dropping the zero operators (including composed products like
    # D_dephase @ A_raise, which is identically zero) halves/quarters the
    # lifted matmul work per DELAY (each operator costs two 2^n x 2^n
    # matmuls downstream)
    ops = [k for k in ops if np.abs(k).max() > 0]
    return np.stack(ops)


def run_density_matrix(circuit: Circuit, qubits: Sequence[int],
                       dtype=jnp.complex128,
                       t1s: Optional[Dict[int, float]] = None,
                       t2s: Optional[Dict[int, float]] = None) -> jnp.ndarray:
    """Evolve |0..0><0..0| through the circuit including attached gate noise.

    Gate noise entries (name, qubits_or_None, kraus_stack) apply their channel
    after each gate whose name (and qubits, if specified) match — mirroring
    pyquil's define_noisy_gate semantics. DELAY gates additionally decohere
    under the optional per-qubit t1s/t2s model.
    """
    qubits = list(qubits)
    n = len(qubits)
    pos = {q: i for i, q in enumerate(qubits)}
    d = 2 ** n
    rho = jnp.zeros((d, d), dtype=dtype).at[0, 0].set(1.0)
    for gate in circuit.gates:
        axes = [pos[q] for q in gate.qubits]
        mat = jnp.asarray(gate.get_matrix(), dtype=dtype)
        rho = apply_gate_to_density(rho, mat, axes, n)
        if gate.name == "DELAY" and (t1s or t2s):
            q = gate.qubits[0]
            kraus = decoherence_kraus(gate.params[0],
                                      (t1s or {}).get(q), (t2s or {}).get(q))
            rho = apply_kraus_to_density(rho, jnp.asarray(kraus, dtype=dtype),
                                         axes, n)
        for name, nq, kraus in circuit.gate_noise:
            if name == gate.name and (nq is None or tuple(nq) == tuple(gate.qubits)):
                rho = apply_kraus_to_density(rho, jnp.asarray(kraus, dtype=dtype),
                                             axes, n)
    return rho


def confusion_matrix_for(circuit: Circuit, qubits: Sequence[int],
                         dtype=jnp.float64) -> Optional[jnp.ndarray]:
    """Full readout confusion C with C[obs, true] over the listed qubits."""
    if not circuit.readout_confusion:
        return None
    c = jnp.eye(1, dtype=dtype)
    for q in qubits:
        cq = circuit.readout_confusion.get(q)
        if cq is None:
            cq = np.eye(2)
        # stored row-stochastic p(observed|true) with rows=true: transpose to
        # column-action form obs = C @ true
        c = jnp.kron(c, jnp.asarray(cq, dtype=dtype).T)
    return c


def apply_confusion(probs: jnp.ndarray, circuit: Circuit,
                    qubits: Sequence[int]) -> jnp.ndarray:
    """Apply per-qubit readout confusion to a probability vector."""
    c = confusion_matrix_for(circuit, qubits, dtype=probs.dtype)
    if c is None:
        return probs
    return c @ probs


def density_probabilities(circuit: Circuit, qubits: Sequence[int],
                          dtype=jnp.complex128,
                          t1s: Optional[Dict[int, float]] = None,
                          t2s: Optional[Dict[int, float]] = None) -> jnp.ndarray:
    """Measurement probabilities including gate noise and readout confusion."""
    rho = run_density_matrix(circuit, qubits, dtype, t1s=t1s, t2s=t2s)
    probs = jnp.real(jnp.diagonal(rho))
    probs = jnp.clip(probs, 0, None)
    probs = probs / jnp.sum(probs)
    return apply_confusion(probs, circuit, qubits)
